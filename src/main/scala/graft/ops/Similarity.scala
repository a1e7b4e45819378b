package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (reference seeds: cosine_similarity MAIN/operator/scalar/MathFunctions
  * .java:1710, create_vector_index CreateVectorIndexAggregation.java:37,
  * Lance vector connector presto-lance/).
  *
  * Two tiers, mirroring how a 100 TB pipeline is built:
  *  - bruteTopK: exact baseline. Score computation is a codegen'd double
  *    fold; per-query top-k goes through a row_number window that Spark
  *    plans as WindowGroupLimitExec (per-partition heaps, then one k-sized
  *    shuffle per query — never a global sort).
  *  - lshAnn: the scale path. Deterministic random-hyperplane signatures
  *    bucket the corpus; each query probes exactly one bucket, so the join
  *    fan-out is corpus_size/2^planes per query instead of corpus_size.
  *    Plane components are md5-derived constants (embedded as a literal
  *    array, zero per-row hashing) so any engine can reproduce them.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private val Dim = 64
  private val Planes = 4

  /** Deterministic pseudo-random hyperplane component in [-1000, 1000]:
    * first 15 md5 hex digits of "p_j" as an integer, mod-centered. Matches
    * the SQL `CAST('0x'||substr(md5(p||'_'||j),1,15) AS BIGINT) % 2001 - 1000`. */
  private def planeComponent(p: Int, j: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${p}_$j".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 2001L - 1000L).toDouble
  }

  private val planeLit: Column = typedLit(
    (0 until Planes).map(p => (0 until Dim).map(j => planeComponent(p, j))))

  /** LSH bucket id of a vector: bit p = sign(v · plane_p). */
  private[ops] def bucketOf(vec: Column): Column =
    aggregate(
      sequence(lit(0), lit(Planes - 1)),
      lit(0L),
      (acc, p) => acc + when(
        aggregate(
          zip_with(vec, element_at(planeLit, p + lit(1)),
            (x, w) => x.cast("double") * w),
          lit(0.0), (a, v) => a + v) > 0,
        pow(lit(2.0), p).cast("long")).otherwise(lit(0L)))

  /** Exact brute-force cosine top-k per query vector (queries: vec_id < 5). */
  def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = broadcast(q).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qvec"), col("embedding")).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rk")
  }

  /** LSH-bucketed ANN: queries only compare against their own
    * random-hyperplane bucket. Recall < 1 by construction (that is the
    * trade); at 100 TB the bucket join replaces a full cross product. */
  def lshAnn(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), bucketOf(col("embedding")).as("bucket"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val scored = broadcast(q)
      .join(e, col("qbucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qvec"), col("embedding")).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rk")
  }

  /** IVF-style ANN (the scale path next to LSH): a coarse quantizer assigns
    * every vector to its nearest-centroid cell; queries probe only their 2
    * nearest cells. Centroids here are a deterministic seed subset (vec_id
    * < 8) so the oracle can replay the assignment — a production IVF
    * k-means-trains them, but the index structure, the broadcast quantizer,
    * and the probe-limited join (fan-out = corpus/K × nprobe instead of
    * corpus) are exactly what runs at 100 TB, with cells as the partition
    * key of the stored index. */
  /** Rank every vector against the (broadcast) centroids: columns
    * (vec_id, embedding, cent_id, cs, crk) with crk=1 the assigned cell. */
  private[graft] def centRank(e: DataFrame, cents: DataFrame): DataFrame = {
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cs"), asc("cent_id"))
    e.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        Dedup.cosine(col("embedding"), col("cvec")).as("cs"))
      .withColumn("crk", row_number().over(wA))
  }

  /** Probe-limited ANN over an assigned-cells index: each query compares
    * only against its `probe` cells' members. */
  private def probeJoin(probes: DataFrame, cells: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
    broadcast(probes)
      .join(cells, col("probe") === col("cell") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qvec"), col("embedding")).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rk")
  }

  def ivfAnn(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val ranked = centRank(e, cents)
    val cells = ranked.filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val probes = ranked.filter(col("vec_id") < 5 && col("crk") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("cent_id").as("probe"))
    probeJoin(probes, cells)
  }

  /** IVF index PERSISTED as snapshot tables (the reference's
    * create_vector_index seed, CreateVectorIndexAggregation.java:33-38, and
    * the Lance vector connector presto-lance/ — an index you build once and
    * query many times): the corpus→cell assignment (the O(corpus × K) work)
    * and the centroids commit via SnapshotTable.write; every subsequent ANN
    * query reads the committed index, ranks only its QUERY vectors against
    * the broadcast centroids (O(nq × K)), and probe-joins the stored cells —
    * the re-cluster never re-runs. At 100 TB the stored cells are
    * partitioned by `cell`, so a probe reads nprobe/K of the corpus. */
  def ivfIndexReuse(s: SparkSession, dir: String): DataFrame = {
    val suffix = Integer.toHexString(dir.hashCode)
    val cellsBase = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_ivf_cells_$suffix")
    val centsBase = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_ivf_cents_$suffix")
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    if (SnapshotTable.currentVersion(cellsBase).isEmpty ||
        SnapshotTable.currentVersion(centsBase).isEmpty) {
      // index BUILD (once, outside the per-query path): full assignment
      SnapshotTable.write(s, centsBase, cents)
      SnapshotTable.write(s, cellsBase,
        centRank(e, cents).filter(col("crk") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
          .repartition(col("cell"))) // cell-partitioned, the probe-prune key
    }
    // query path: committed index only — no corpus-wide re-cluster
    val idxCells = SnapshotTable.read(s, cellsBase)
    val idxCents = SnapshotTable.read(s, centsBase)
    val queriesDf = e.filter(col("vec_id") < 5)
    val probes = centRank(queriesDf, idxCents).filter(col("crk") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("cent_id").as("probe"))
    probeJoin(probes, idxCells)
  }

  /** The `create_vector_index` SQL name (reference
    * CreateVectorIndexAggregation.java:37 — in presto-main a seed whose
    * output is an empty varchar; the real index lives in the lance
    * connector) routed to the persisted-IVF builder above: build
    * (idempotently) the cell-partitioned snapshot index for
    * `table(idCol, embCol)` with `k` deterministic seed centroids (the k
    * smallest ids) under `path`; returns the index path. Queries then
    * probe the committed cells without re-clustering. */
  def createVectorIndex(s: SparkSession, table: String, idCol: String,
      embCol: String, k: Int, path: String): String = {
    require(k > 0, s"create_vector_index: k must be positive, got $k")
    val base = new java.io.File(path)
    val cellsBase = new java.io.File(base, "cells")
    val centsBase = new java.io.File(base, "centroids")
    if (SnapshotTable.currentVersion(cellsBase).isEmpty ||
        SnapshotTable.currentVersion(centsBase).isEmpty) {
      val e = s.table(table).select(col(idCol).cast("long").as("vec_id"),
        col(embCol).as("embedding"))
      val cents = e.orderBy("vec_id").limit(k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      SnapshotTable.write(s, centsBase, cents)
      SnapshotTable.write(s, cellsBase,
        centRank(e, cents).filter(col("crk") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
          .repartition(col("cell"))) // cell-partitioned, the probe-prune key
    }
    base.getPath
  }

  /** One Lloyd iteration of k-means over cosine cells: re-assign every
    * vector to its nearest centroid, then replace each centroid with its
    * cell's element-wise mean. This is the refinement the IVF index trains
    * with at scale (ivfAnn keeps deterministic seed centroids so its
    * DuckDB oracle can replay the assignment; this path carries the real
    * index-training shape): one broadcast of K centroids + one shuffle of
    * (cell, position, value) triples per iteration — never vector×vector.
    * Returns (cell, cvec) refined centroids. */
  def kmeansRefine(e: DataFrame, centroids: DataFrame): DataFrame = {
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cs"), asc("cent_id"))
    val assigned = e.join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        Dedup.cosine(col("embedding"), col("cvec")).as("cs"))
      .withColumn("crk", row_number().over(wA))
      .filter(col("crk") === 1)
    assigned
      .select(col("cent_id"),
        posexplode(transform(col("embedding"), _.cast("double")))
          .as(Seq("pos", "x")))
      .groupBy("cent_id", "pos")
      .agg(avg(col("x")).as("c"))
      .groupBy("cent_id")
      // float centroids: the embedding space is float and the codegen'd
      // cosine kernel type-checks array<float>
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c").cast("float")).as("cvec"))
  }

  /** Mean distance-to-assigned-centroid (the k-means objective, cosine
    * form: 1 − cos). Used by the spec to verify Lloyd monotonicity. */
  def kmeansObjective(e: DataFrame, centroids: DataFrame): Double = {
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cs"), asc("cent_id"))
    e.join(broadcast(centroids))
      .select(col("vec_id"), col("cent_id"),
        Dedup.cosine(col("embedding"), col("cvec")).as("cs"))
      .withColumn("crk", row_number().over(wA))
      .filter(col("crk") === 1)
      .agg(avg(lit(1.0) - col("cs")))
      .collect()(0).getDouble(0)
  }

  /** int8 embedding quantization — the 4× storage cut every 100 TB
    * embedding store takes (float32 → int8 + per-vector (min, scale)):
    * q_i = round((x_i − min)·255/(max − min)) − 128, reconstruction
    * x̂_i = min + (q_i+128)·(max−min)/255. All HOFs, one codegen pass, no
    * shuffle; the gate pins the exact integer codes (q_sum/q_min/q_max)
    * and the |x̂ − x| ≤ step/2 reconstruction bound per vector. */
  def quantize(s: SparkSession, dir: String): DataFrame = {
    val xd = transform(col("embedding"), _.cast("double"))
    val mn = array_min(xd)
    val mx = array_max(xd)
    val q = transform(xd, e =>
      when(mx === mn, lit(0))
        .otherwise((round((e - mn) * 255 / (mx - mn)) - 128).cast("int")))
    val deq = transform(q, qi =>
      when(mx === mn, mn).otherwise(mn + ((qi + 128) * (mx - mn)) / 255.0))
    val maxErr = array_max(zip_with(xd, deq, (a, b) => abs(b - a)))
    t(s, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"),
        aggregate(q, lit(0L), (acc, v) => acc + v).as("q_sum"),
        array_min(q).cast("long").as("q_min"),
        array_max(q).cast("long").as("q_max"),
        (maxErr <= (mx - mn) / 255.0 / 2 * 1.001 + 1e-12).as("ok_err"))
      .orderBy("vec_id")
  }

  /** Product-quantization ANN (ADC — asymmetric distance computation):
    * the 64-dim space splits into 4 × 16-dim subspaces; each subspace has
    * a 16-entry codebook (deterministic seed subvectors, vec_id < 16, so
    * the oracle replays it — production PQ k-means-trains the codebooks,
    * but the STRUCTURE is identical). Every corpus vector compresses to
    * 4 code bytes (16× memory reduction — the point at 100 TB: the
    * codes+codebooks fit where raw vectors cannot); a query computes one
    * 4×16 distance table against the broadcast codebooks and scores the
    * whole corpus by 4 table lookups per vector — no raw-vector reads in
    * the scoring join. Top-3 by approximate L2², smaller vec_id ties. */
  def pqAnn(s: SparkSession, dir: String): DataFrame = {
    val m = 4
    val dsub = 16
    def l2sq(a: Column, b: Column): Column = aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val sub = e.select(col("vec_id"),
      explode(array((0 until m).map(j => struct(lit(j).as("j"),
        slice(col("embedding"), j * dsub + 1, dsub).as("sub"))): _*))
        .as("sj"))
      .select(col("vec_id"), col("sj.j").as("j"), col("sj.sub").as("sub"))
    val cent = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("j"), col("sub").as("csub"))
    // per (vector, subspace): distance to every codebook entry
    val cd = sub.join(broadcast(cent), Seq("j"))
      .select(col("vec_id"), col("j"), col("cent_id"),
        l2sq(col("sub"), col("csub")).as("d"))
    val wCode = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "j").orderBy(asc("d"), asc("cent_id"))
    val code = cd.withColumn("rk", row_number().over(wCode))
      .filter(col("rk") === 1).select("vec_id", "j", "cent_id")
    // each query's 4x16 distance table (already in cd — queries are
    // corpus members)
    val qd = cd.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("j"), col("cent_id"),
        col("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("adist"), asc("vec_id"))
    code.join(broadcast(qd), Seq("j", "cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id").agg(sum("d").as("adist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), round(col("adist"), 4).as("adist"))
      .orderBy("query_id", "rk")
  }

  /** Cluster-balanced resampling — the semantic-diversity stage a corpus
    * build runs after dedup (the SemDeDup/DoReMi idea applied to cluster
    * OCCUPANCY): assign every embedding to its nearest-centroid cell
    * (same deterministic seed quantizer as [[ivfAnn]], so the oracle
    * replays the assignment), then resample each cell to a uniform
    * budget — keep-rate = min(1, (total × 0.5 / K) / cell_size), with
    * the corpus-standard deterministic md5-threshold coin (the
    * [[TextAnalysis.mixtureSample]] trick, cluster-keyed instead of
    * source-keyed). Over-represented topics shrink, rare topics survive
    * whole.
    *
    * Scale shape: one broadcast of K centroids (K rows), one cell-keyed
    * count, one broadcast of K rates back onto the assignment — the
    * corpus never shuffles on anything finer than the cell key, and the
    * keep decision is a per-row hash compare. */
  def clusterBalance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    // argmax via a struct-max aggregate instead of centRank's rank window:
    // same assignment (max cosine, ties to the smaller cent_id via the
    // negated id) but the shuffle carries ONE partially-aggregated row per
    // vector, not K window-sorted rows — the shape that matters when the
    // corpus is 10^10 vectors
    // the codegen'd CosineSimilarity kernel (same sequential fold order as
    // Dedup.cosine's HOF, so bit-identical) — the HOF is interpreted and
    // measured 3-4× slower on the 40k-vector corpus bench
    val cells = e.join(broadcast(cents))
      .select(col("vec_id"),
        struct(graft.functions.GraftFunctions
          .cosineSimilarity(col("embedding"), col("cvec")).as("cs"),
          (-col("cent_id")).as("nc")).as("sc"))
      .groupBy("vec_id").agg(max(col("sc")).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cell"))
    val counts = cells.groupBy("cell").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("t"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("rate", least(lit(1.0),
        col("t").cast("double") * 0.5 / 8.0 / col("n").cast("double")))
      .withColumn("thr", lpad(lower(hex(
        floor(col("rate") * 4294967296.0).cast("long"))), 8, "0"))
    cells.join(broadcast(rates), "cell")
      .filter(col("rate") >= 1.0 ||
        substring(md5(concat(lit("bal_"), col("vec_id").cast("string"))),
          1, 8) < col("thr"))
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .orderBy("vec_id")
  }

  /** Packed vector format (functions/VecPack.scala — the lance
    * connector's fixed-size-list float32 surface, presto-lance):
    * embeddings pack to little-endian float32 varbinary; the gate proves
    * (a) pack→unpack is lossless and (b) the packed cosine kernel
    * returns the EXACT double of the array-path kernel (same sequential
    * fold), both asserted Spark-side as strict equality, while the
    * cosine VALUES hash-match the DuckDB unnest-SUM oracle. The point is
    * interchange — pre-packed feature-store blobs are queryable without
    * an unpack pass (at-rest/probe measured at parity vs array<float>
    * parquet, BENCH_vecpack_r13.json — no inflated compression claim). */
  def packedCosine(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{GraftFunctions, VecPack}
    val e = t(s, dir, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"),
        VecPack.pack(col("embedding")).as("pv"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(GraftFunctions.cosineSimilarity(
          col("a.embedding"), col("b.embedding")), 4).as("cos"),
        (VecPack.cosine(col("a.pv"), col("b.pv")) ===
          GraftFunctions.cosineSimilarity(
            col("a.embedding"), col("b.embedding"))).as("packed_exact"),
        (VecPack.unpack(col("a.pv")) === col("a.embedding"))
          .as("roundtrip_exact"))
      .orderBy("va", "vb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_packed_cosine" -> packedCosine,
    "sim_cluster_balance" -> clusterBalance,
    "sim_pq_ann" -> pqAnn,
    "sim_quantize" -> quantize,
    "sim_topk_brute" -> bruteTopK,
    "sim_lsh_ann" -> lshAnn,
    "sim_ivf_ann" -> ivfAnn,
    "sim_ivf_index_reuse" -> ivfIndexReuse)

  private val cosineCte =
    """u AS (SELECT query_id, vec_id, unnest(qv) x, unnest(ev) y FROM p),
      |d AS (SELECT query_id, vec_id,
      |       SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) dot,
      |       sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) nq,
      |       sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) ne
      |      FROM u GROUP BY 1, 2),
      |r AS (SELECT query_id, vec_id, dot / (nq * ne) c,
      |       row_number() OVER (PARTITION BY query_id
      |         ORDER BY dot / (nq * ne) DESC, vec_id) rk
      |      FROM d)
      |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id AS neighbor_id,
      | ROUND(c, 4) AS cosine
      |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin

  private val ivfOracleSql =
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
       |              FROM embeddings WHERE vec_id < 8),
       |pc AS (SELECT e.vec_id, c.cent_id, e.embedding ev, c.cvec
       |       FROM embeddings e CROSS JOIN cent c),
       |pu AS (SELECT vec_id, cent_id, unnest(ev) x, unnest(cvec) y FROM pc),
       |pd AS (SELECT vec_id, cent_id,
       |        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) dot,
       |        sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) na,
       |        sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) nb
       |       FROM pu GROUP BY 1, 2),
       |rkd AS (SELECT vec_id, cent_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY dot / (na * nb) DESC, cent_id) crk
       |        FROM pd),
       |cells AS (SELECT vec_id, cent_id AS cell FROM rkd WHERE crk = 1),
       |probes AS (SELECT vec_id AS query_id, cent_id AS probe
       |           FROM rkd WHERE vec_id < 5 AND crk <= 2),
       |p AS (SELECT pr.query_id, qe.embedding qv, ce.vec_id vec_id, ee.embedding ev
       |      FROM probes pr
       |      JOIN cells ce ON ce.cell = pr.probe AND ce.vec_id <> pr.query_id
       |      JOIN embeddings qe ON qe.vec_id = pr.query_id
       |      JOIN embeddings ee ON ee.vec_id = ce.vec_id),
       |$cosineCte""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_packed_cosine" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |p AS (SELECT a.vec_id va, b.vec_id vb, a.embedding ea, b.embedding eb
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |u AS (SELECT va, vb, unnest(ea) x, unnest(eb) y FROM p),
        |d AS (SELECT va, vb,
        |        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) dot,
        |        sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) na,
        |        sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) nb
        |      FROM u GROUP BY 1, 2)
        |SELECT va, vb, ROUND(dot / (na * nb), 4) AS cos,
        |  true AS packed_exact, true AS roundtrip_exact
        |FROM d ORDER BY va, vb""".stripMargin,
    "sim_cluster_balance" ->
      """WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
        |              FROM embeddings WHERE vec_id < 8),
        |pc AS (SELECT e.vec_id, c.cent_id, e.embedding ev, c.cvec
        |       FROM embeddings e CROSS JOIN cent c),
        |pu AS (SELECT vec_id, cent_id, unnest(ev) x, unnest(cvec) y FROM pc),
        |pd AS (SELECT vec_id, cent_id,
        |        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) dot,
        |        sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) na,
        |        sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) nb
        |       FROM pu GROUP BY 1, 2),
        |rkd AS (SELECT vec_id, cent_id,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY dot / (na * nb) DESC, cent_id) crk
        |        FROM pd),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rkd WHERE crk = 1),
        |counts AS (SELECT cell, count(*) AS n FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts),
        |rates AS (SELECT cell,
        |    least(CAST(1.0 AS DOUBLE),
        |      t * CAST(0.5 AS DOUBLE) / CAST(8.0 AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS rate
        |  FROM counts, tot)
        |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell
        |FROM cells c JOIN rates r ON c.cell = r.cell
        |WHERE r.rate >= 1.0
        |   OR substring(md5('bal_' || CAST(c.vec_id AS VARCHAR)), 1, 8)
        |      < lpad(lower(to_hex(CAST(floor(r.rate *
        |          CAST(4294967296 AS DOUBLE)) AS BIGINT))), 8, '0')
        |ORDER BY c.vec_id""".stripMargin,
    "sim_pq_ann" ->
      """WITH js AS (SELECT unnest([0,1,2,3]) AS j),
        |sub AS (SELECT vec_id, j, embedding[j*16+1 : (j+1)*16] AS sub
        |        FROM embeddings CROSS JOIN js),
        |cent AS (SELECT vec_id AS cent_id, j, sub AS csub
        |         FROM sub WHERE vec_id < 16),
        |pairs AS (SELECT s.vec_id, s.j, c.cent_id, s.sub, c.csub
        |          FROM sub s JOIN cent c ON s.j = c.j),
        |u AS (SELECT vec_id, j, cent_id, unnest(sub) AS x,
        |       unnest(csub) AS y FROM pairs),
        |cd AS (SELECT vec_id, j, cent_id,
        |        SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
        |            (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))) AS d
        |       FROM u GROUP BY 1,2,3),
        |code AS (SELECT vec_id, j, cent_id FROM (
        |          SELECT vec_id, j, cent_id, row_number() OVER (
        |            PARTITION BY vec_id, j ORDER BY d, cent_id) rk
        |          FROM cd) WHERE rk = 1),
        |qd AS (SELECT vec_id AS query_id, j, cent_id, d
        |       FROM cd WHERE vec_id < 5),
        |ad AS (SELECT q.query_id, k.vec_id, SUM(q.d) AS adist
        |       FROM code k JOIN qd q
        |         ON k.j = q.j AND k.cent_id = q.cent_id
        |       WHERE k.vec_id <> q.query_id GROUP BY 1,2),
        |r AS (SELECT query_id, vec_id, adist, row_number() OVER (
        |        PARTITION BY query_id ORDER BY adist, vec_id) rk FROM ad)
        |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id AS neighbor_id,
        |  ROUND(adist, 4) AS adist
        |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "sim_quantize" ->
      """WITH u AS (SELECT vec_id, CAST(x AS DOUBLE) x
        |           FROM (SELECT vec_id, unnest(embedding) x
        |                 FROM embeddings WHERE vec_id < 200)),
        |s AS (SELECT vec_id, min(x) mn, max(x) mx FROM u GROUP BY 1),
        |q AS (SELECT u.vec_id, x, mn, mx,
        |       CASE WHEN mx = mn THEN 0
        |            ELSE CAST(round((x - mn) * 255 / (mx - mn)) AS BIGINT) - 128
        |       END q
        |      FROM u JOIN s USING (vec_id)),
        |d AS (SELECT vec_id, q, x, mn, mx,
        |       CASE WHEN mx = mn THEN mn
        |            ELSE mn + ((q + 128) * (mx - mn)) / 255.0 END xr
        |      FROM q)
        |SELECT vec_id, CAST(SUM(q) AS BIGINT) AS q_sum,
        | MIN(q) AS q_min, MAX(q) AS q_max,
        | MAX(abs(xr - x)) <= (MAX(mx) - MIN(mn)) / 255.0 / 2 * 1.001 + 1e-12
        |  AS ok_err
        |FROM d GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "sim_topk_brute" ->
      s"""WITH p AS (SELECT q.vec_id query_id, q.embedding qv,
         |            e.vec_id vec_id, e.embedding ev
         |           FROM embeddings q JOIN embeddings e ON q.vec_id < 5
         |            AND e.vec_id <> q.vec_id),
         |$cosineCte""".stripMargin,
    // the persisted-index path must return EXACTLY the per-query answers of
    // the inline IVF (same centroids, same cells) — one oracle, two gates
    "sim_ivf_index_reuse" -> ivfOracleSql,
    "sim_ivf_ann" -> ivfOracleSql,
    "sim_lsh_ann" ->
      s"""WITH comp AS (
         |  SELECT p, j + 1 AS j,
         |   CAST(CAST('0x' || substr(md5(p::VARCHAR || '_' || j::VARCHAR), 1, 15)
         |     AS BIGINT) % 2001 - 1000 AS DOUBLE) w
         |  FROM (SELECT unnest(range(4)) p) CROSS JOIN (SELECT unnest(range(64)) j)),
         |vx AS (SELECT vec_id, unnest(embedding) x,
         |        generate_subscripts(embedding, 1) j
         |       FROM embeddings),
         |dots AS (
         |  SELECT vx.vec_id, comp.p, SUM(CAST(vx.x AS DOUBLE) * comp.w) dp
         |  FROM vx JOIN comp ON vx.j = comp.j
         |  GROUP BY 1, 2),
         |bk AS (SELECT vec_id,
         |        SUM(CASE WHEN dp > 0 THEN CAST(2 ** p AS BIGINT) ELSE 0 END) bucket
         |       FROM dots GROUP BY 1),
         |p AS (SELECT q.vec_id query_id, qe.embedding qv,
         |       e.vec_id vec_id, ee.embedding ev
         |      FROM bk q JOIN bk e ON q.vec_id < 5 AND q.bucket = e.bucket
         |       AND e.vec_id <> q.vec_id
         |      JOIN embeddings qe ON qe.vec_id = q.vec_id
         |      JOIN embeddings ee ON ee.vec_id = e.vec_id),
         |$cosineCte""".stripMargin)
}
