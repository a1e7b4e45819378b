package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrayMapExtras._

/** Edge semantics of the SQL-invoked array/map helpers that the oracle gate
  * (fn_array_adv2 / fn_map_adv) doesn't reach: duplicated nulls, ties under
  * non-injective lambdas, higher combination sizes, empty inputs. Expected
  * values mirror the reference macro expansions in ArraySqlFunctions.java /
  * MapSqlFunctions.java. */
class ArrayMapExtrasSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).collect()(0)

  test("array_duplicates includes a duplicated null once, first") {
    val arr = array(lit(1L), lit(null).cast("long"), lit(1L),
      lit(null).cast("long"), lit(2L))
    val r = one(arrayDuplicates(arr).as("d")).getSeq[java.lang.Long](0)
    assert(r == Seq(null, 1L))
  }

  test("array_max_by ties pick the last index, min_by the first") {
    // f(x) = x % 3: values 1,4 both map to 1 (max); reference zip_with+max
    // semantics select the LARGEST index among ties for max_by
    val arr = array(lit(1L), lit(4L), lit(2L))
    assert(one(arrayMaxBy(arr, x => x % 3)).getLong(0) == 2L) // f=2 unique
    val arr2 = array(lit(1L), lit(4L), lit(0L))
    assert(one(arrayMaxBy(arr2, x => x % 3)).getLong(0) == 4L) // tie 1,4 → last
    assert(one(arrayMinBy(arr2, x => x % 3)).getLong(0) == 0L)
  }

  test("combinations n=3 in lexicographic index order") {
    val arr = array(lit(1L), lit(2L), lit(3L), lit(4L))
    val r = one(combinations(arr, 3)).getSeq[Seq[Long]](0)
    assert(r == Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 4L), Seq(1L, 3L, 4L),
      Seq(2L, 3L, 4L)))
    // n larger than the array → empty
    val small = array(lit(1L), lit(2L))
    assert(one(combinations(small, 3)).getSeq[Seq[Long]](0).isEmpty)
  }

  test("array_split_into_chunks on empty array and exact division") {
    val empty = slice(array(lit(1L)), 1, 0)
    assert(one(arraySplitIntoChunks(empty, 2)).getSeq[Seq[Long]](0).isEmpty)
    val r = one(arraySplitIntoChunks(array(lit(1L), lit(2L), lit(3L), lit(4L)), 2))
      .getSeq[Seq[Long]](0)
    assert(r == Seq(Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("map_top_n keeps null-valued entries last, key-descending") {
    val m = map_from_arrays(
      array(lit("a"), lit("b"), lit("c")),
      array(lit(null).cast("double"), lit(null).cast("double"), lit(1.0)))
    val r = one(mapTopN(m, 2).as("m")).getMap[String, java.lang.Double](0)
    // top1 = c:1.0 (only non-null); second slot = null-valued key desc = b
    assert(r.keySet == Set("c", "b"))
    assert(r("c") == 1.0 && r("b") == null)
  }

  test("array_average ignores nulls, null on all-null") {
    val arr = array(lit(2.0), lit(null).cast("double"), lit(4.0))
    assert(one(arrayAverage(arr)).getDouble(0) == 3.0)
    val alln = array(lit(null).cast("double"))
    assert(one(arrayAverage(alln)).isNullAt(0))
  }

  test("array_max_by/min_by SQL names: ties, null f-values, empty, n-ary intersect") {
    functions.GraftFunctions.register(spark)
    def sql1(q: String): org.apache.spark.sql.Row =
      spark.sql(s"SELECT $q AS v").collect()(0)
    // tie on f: max_by keeps the LATEST element, min_by the EARLIEST
    // (reference macro array_max/min over (value, index) rows)
    assert(sql1("array_max_by(array(10, 20, 30), x -> x % 2)").getInt(0) == 30)
    assert(sql1("array_min_by(array(10, 20, 30), x -> x % 2)").getInt(0) == 10)
    // null f-values skipped (documented deviation, same as the Column API)
    assert(sql1("array_max_by(array(1, 8, 3), x -> IF(x = 8, NULL, x))")
      .getInt(0) == 3)
    // empty and null inputs → NULL
    assert(sql1("array_max_by(CAST(array() AS ARRAY<INT>), x -> x)").isNullAt(0))
    assert(sql1("array_min_by(CAST(NULL AS ARRAY<INT>), x -> x)").isNullAt(0))
    // n-ary array_intersect folds; 2-arg stays the builtin
    assert(sql1("array_intersect(array(array(1, 2, 3, 2), array(2, 3), " +
      "array(3, 2, 9)))").getSeq[Int](0) == Seq(2, 3))
    assert(sql1("array_intersect(CAST(array() AS ARRAY<ARRAY<INT>>))")
      .getSeq[Int](0).isEmpty)
    assert(sql1("array_intersect(array(1, 2), array(2))").getSeq[Int](0) ==
      Seq(2))
    // string helpers through SQL names, negative split index from the end
    assert(sql1("replace_first('banana', 'a', 'X')").getString(0) == "bXnana")
    assert(sql1("trail('abcdef', 4)").getString(0) == "cdef")
    assert(sql1("split_part_reverse('a.b.c', '.', -1)").getString(0) == "c")
    assert(sql1("split_part_reverse('a.b.c', '.', 2)").getString(0) == "b")
    assert(sql1("split_part_reverse('a.b.c', '.', -4)").isNullAt(0))
  }
}
