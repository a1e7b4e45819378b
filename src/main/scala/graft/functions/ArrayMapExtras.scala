package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** The reference's SQL-invoked array/map helper functions
  * (presto-sql-invoked-functions-plugin: ArraySqlFunctions.java,
  * MapSqlFunctions.java, MapNormalizeFunction.java, MapSubsetFunction.java,
  * ArrayCombinationsFunction.java) re-expressed as compositions of Spark's
  * built-in higher-order functions — the reference itself defines most of
  * these as SQL macro expansions over its builtins, so composition IS the
  * faithful architecture here (SURVEY.md §7.3 case (a)). Everything stays
  * inside Catalyst's native HOF evaluation: no UDFs, no driver loops.
  */
object ArrayMapExtras {

  /** remove_nulls(a) — ArraySqlFunctions.java:150. */
  def removeNulls(a: Column): Column = filter(a, _.isNotNull)

  /** array_average(a): mean ignoring nulls, NULL on empty — :27. */
  def arrayAverage(a: Column): Column = {
    val s = aggregate(removeNulls(a), lit(0.0), (acc, x) => acc + x)
    val n = size(removeNulls(a))
    when(n > 0, s / n)
  }

  /** array_sort_desc(a): non-null desc, nulls last — :140. */
  def arraySortDesc(a: Column): Column =
    concat(reverse(array_sort(removeNulls(a))), filter(a, _.isNull))

  /** array_top_n(a, n): top n by natural descending order — :160. */
  def arrayTopN(a: Column, n: Int): Column = slice(arraySortDesc(a), 1, n)

  /** array_split_into_chunks(a, sz) — :40. */
  def arraySplitIntoChunks(a: Column, sz: Int): Column = {
    require(sz > 0, s"Invalid slice size: $sz. Size must be greater than zero.")
    // element-type-generic empty array<array<T>> for the empty-input branch
    val emptyAA = slice(transform(a, _ => a), 1, 0)
    when(size(a) === 0, emptyAA)
      .otherwise(transform(
        sequence(lit(0), ((size(a) + lit(sz - 1)) / lit(sz)).cast("int") - 1),
        i => slice(a, i * sz + 1, lit(sz))))
  }

  /** array_frequency(a): map value→count over non-null elements, keys in
    * first-appearance order (reference reduce/MAP_CONCAT builds it the same
    * way) — :58. */
  def arrayFrequency(a: Column): Column =
    map_from_entries(transform(array_distinct(removeNulls(a)),
      x => struct(x.as("key"),
        size(filter(a, y => y === x)).cast("long").as("value"))))

  /** array_duplicates(a): values appearing more than once (null included
    * once if duplicated) — :72. */
  def arrayDuplicates(a: Column): Column = {
    val dupNonNull = map_keys(map_filter(arrayFrequency(a), (_, v) => v > 1))
    val nullOnce = slice(filter(a, _.isNull), 1, 1) // [null] as array<T>
    when(size(filter(a, _.isNull)) > 1, concat(nullOnce, dupNonNull))
      .otherwise(dupNonNull)
  }

  /** array_has_duplicates(a) — :84. */
  def arrayHasDuplicates(a: Column): Column = size(arrayDuplicates(a)) > 0

  /** array_least_frequent(a, n): n least frequent non-null values, ties by
    * ascending value — :104. */
  def arrayLeastFrequent(a: Column, n: Int): Column = {
    val byCount = array_sort(transform(map_entries(arrayFrequency(a)),
      e => struct(e.getField("value").as("c"), e.getField("key").as("v"))))
    when(size(removeNulls(a)) > 0,
      transform(slice(byCount, 1, n), s => s.getField("v")))
  }

  /** array_max_by(a, f): element maximizing f (null f-values skipped) — :114. */
  def arrayMaxBy(a: Column, f: Column => Column): Column =
    element_at(a, array_max(zip_with(transform(a, f),
      sequence(lit(1), size(a)),
      (x, i) => when(x.isNotNull, struct(x.as("x"), i.as("i"))))).getField("i"))

  /** array_min_by(a, f) — :127. */
  def arrayMinBy(a: Column, f: Column => Column): Column =
    element_at(a, array_min(zip_with(transform(a, f),
      sequence(lit(1), size(a)),
      (x, i) => when(x.isNotNull, struct(x.as("x"), i.as("i"))))).getField("i"))

  /** array_intersect(array<array<T>>) — the n-ary overload
    * (ArrayIntersectFunction.java: reduce(input, input[1],
    * array_intersect)): distinct elements present in EVERY sub-array,
    * first-subarray order; ARRAY[] on empty input. */
  def arrayIntersectAll(a: Column): Column = {
    // flatten(slice(a,1,0)) is an element-type-generic empty array<T>
    val init = when(size(a) === 0, flatten(slice(a, 1, 0)))
      .otherwise(element_at(a, 1))
    aggregate(a, init, (s, x) => array_intersect(s, x))
  }

  /** array_transpose(m): a[x][y] → a[y][x]; rows must be same length — :178. */
  def arrayTranspose(a: Column): Column =
    when(size(a) === 0, a).otherwise(
      transform(sequence(lit(1), size(element_at(a, 1))),
        x => transform(a, y => element_at(y, x))))

  /** combinations(a, n) (ArrayCombinationsFunction.java): all n-element
    * subsequences in lexicographic index order. n is a plan-time literal;
    * the expression tree is built by recursion over n (bounded like the
    * reference, which caps combination size at 5). */
  def combinations(a: Column, n: Int): Column = {
    require(n >= 1 && n <= 5, s"combinations size must be in [1,5], got $n")
    val sz = size(a)
    def seqSafe(from: Column, to: Column): Column =
      when(from <= to, sequence(from, to))
        .otherwise(array().cast(ArrayType(IntegerType)))
    // f(k, from) = all k-combinations from index `from`.. as array<array<T>>
    def f(k: Int, from: Column): Column =
      if (k == 1) transform(seqSafe(from, sz), i => array(element_at(a, i)))
      else flatten(transform(seqSafe(from, sz - (k - 1)),
        i => transform(f(k - 1, i + 1),
          tail => concat(array(element_at(a, i)), tail))))
    f(n, lit(1))
  }

  /** map_top_n(m, n): top n entries by (value desc, key desc), null values
    * last by key desc — MapSqlFunctions.java:49. */
  def mapTopN(m: Column, n: Int): Column = {
    val nonNull = transform(
      map_entries(map_filter(m, (_, v) => v.isNotNull)),
      e => struct(e.getField("value").as("v"), e.getField("key").as("k")))
    val sortedNonNull = reverse(array_sort(nonNull))
    // null-valued entries, key-descending, keeping the map's value type
    val nullsByKeyDesc = transform(
      reverse(array_sort(map_entries(map_filter(m, (_, v) => v.isNull)))),
      e => struct(e.getField("value").as("v"), e.getField("key").as("k")))
    map_from_entries(transform(
      slice(concat(sortedNonNull, nullsByKeyDesc), 1, n),
      s => struct(s.getField("k").as("key"), s.getField("v").as("value"))))
  }

  /** map_top_n_keys(m, n): keys desc — :61. */
  def mapTopNKeys(m: Column, n: Int): Column =
    slice(reverse(array_sort(map_keys(m))), 1, n)

  /** map_top_n_values(m, n): values desc (nulls last) — :83. */
  def mapTopNValues(m: Column, n: Int): Column =
    slice(arraySortDesc(map_values(m)), 1, n)

  /** map_keys_by_top_n_values(m, n) — :27. */
  def mapKeysByTopNValues(m: Column, n: Int): Column = map_keys(mapTopN(m, n))

  /** map_key_exists(m, k) — :38. */
  def mapKeyExists(m: Column, k: Column): Column =
    array_contains(map_keys(m), k)

  /** map_remove_null_values(m) — :105. */
  def mapRemoveNullValues(m: Column): Column =
    map_filter(m, (_, v) => v.isNotNull)

  /** map_normalize(m): values divided by the sum of all non-null values —
    * MapNormalizeFunction.java. */
  def mapNormalize(m: Column): Column = {
    val total = aggregate(removeNulls(map_values(m)), lit(0.0), (s, x) => s + x)
    transform_values(m, (_, v) => v / total)
  }

  /** map_subset(m, keys) (MapSubsetFunction.java): entries whose key is in
    * the given array. */
  def mapSubset(m: Column, keys: Column): Column =
    map_filter(m, (k, _) => array_contains(keys, k))

  /** all/any/no keys/values match — MapSqlFunctions.java:116-168. */
  def allKeysMatch(m: Column, f: Column => Column): Column = forall(map_keys(m), f)
  def anyKeysMatch(m: Column, f: Column => Column): Column = exists(map_keys(m), f)
  def noKeysMatch(m: Column, f: Column => Column): Column = !exists(map_keys(m), f)
  def anyValuesMatch(m: Column, f: Column => Column): Column = exists(map_values(m), f)
  def noValuesMatch(m: Column, f: Column => Column): Column = !exists(map_values(m), f)

  /** map_int_keys_to_array(m) — MapSqlFunctions.java:171: positions 1..max
    * key (≤10k), NULL where absent; non-positive or >10k keys raise. */
  def mapIntKeysToArray(m: Column): Column = {
    val keys = map_keys(m)
    when(array_max(keys) > 10000, raise_error(lit(
      "Max key value must be <= 10k for map_int_keys_to_array function")))
      .when(array_min(keys) <= 0, raise_error(concat(lit(
        "Only positive keys allowed in map_int_keys_to_array function, but got: "),
        array_min(keys).cast("string"))))
      .otherwise(transform(sequence(lit(1), array_max(keys)),
        k => element_at(m, k)))
  }

  /** array_to_map_int_keys(a) — MapSqlFunctions.java:186: 1-based index →
    * non-null element. */
  def arrayToMapIntKeys(a: Column): Column =
    when(size(a) > 10000, raise_error(lit(
      "Max number of elements must be <= 10k for array_to_map_int_keys function")))
      .otherwise(map_from_entries(removeNulls(
        transform(sequence(lit(1), greatest(size(a), lit(1))), i =>
          when(element_at(a, i).isNotNull,
            struct(i.as("key"), element_at(a, i).as("value")))))))

  /** key_sampling_percent(s) — SimpleSamplingPercent.java:25: stable
    * [0, 1) bucket from the xxhash64 bits of the string, the reference's
    * key-based-sampling hook (SystemSessionProperties.java:1817). The
    * reference reinterprets the 8 hash bytes as an IEEE double
    * (from_ieee754_64∘xxhash64); Spark's xxhash64 yields the long
    * directly, so the bit reinterpretation is one codegen'd call. */
  def keySamplingPercent(s: Column): Column =
    abs(graft.functions.GraftFunctions.fromIeee754Bits(xxhash64(s)) % 100) / 100.0
}
