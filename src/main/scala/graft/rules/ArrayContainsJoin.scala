package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Rewrite `contains(arr, key)` join predicates into equi-joins over the
  * unnested array (reference: MAIN/sql/planner/iterative/rule/
  * CrossJoinWithArrayContainsToInnerJoin.java — "LEFT cross join RIGHT on
  * contains(l_array, r_key)" becomes "unnest(array_distinct(l_array))
  * inner-join RIGHT on element = r_key").
  *
  * Why this matters at 100 TB: a contains() predicate is not an equi
  * condition, so Spark can only plan the join as a broadcast
  * nested-loop / cartesian — O(|L|·|R|) comparisons and an un-shardable
  * broadcast. After the rewrite it is a plain equi-join: hash-partitioned
  * both sides, shuffle O(|L|·avg_arr + |R|), AQE/skew handling all apply.
  *
  * Semantics preserved exactly:
  *  - `array_distinct` before the explode keeps one row per (l, r) pair
  *    even when the array holds duplicates (the reference wraps the same
  *    way);
  *  - a NULL key or NULL array never satisfies contains() = TRUE, and the
  *    equi-join drops the same rows (explode of NULL emits nothing, NULL
  *    never equals);
  *  - extra conjuncts stay in the rewritten join condition.
  * Guards: deterministic array+key, atomic element type matching the key
  * type, array strictly from one side and key strictly from the other.
  *
  * Outer joins (reference LeftJoinWithArrayContainsToEquiJoinCondition):
  * when the array is on the NON-preserved side of a LEFT (resp. RIGHT)
  * join, that side can be unnested the same way — the preserved side's
  * multiplicity is untouched, unmatched preserved rows still null-extend,
  * and array_distinct keeps one match per pair. An array on the
  * PRESERVED side is never rewritten (exploding it would duplicate
  * preserved rows).
  */
object ArrayContainsJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def atomicElem(arr: Expression): Boolean = arr.dataType match {
    case ArrayType(_: ArrayType | _: MapType | _: StructType, _) => false
    case _: ArrayType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt @ (Inner | Cross | LeftOuter | RightOuter),
        Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // the generated (exploded) side must not be row-preserved
      val mayExplodeLeft = jt == Inner || jt == Cross || jt == RightOuter
      val mayExplodeRight = jt == Inner || jt == Cross || jt == LeftOuter
      val hit = conjuncts.zipWithIndex.collectFirst {
        // array from the left, key from the right
        case (ArrayContains(arr, key), i)
          if mayExplodeLeft &&
            arr.deterministic && key.deterministic && atomicElem(arr) &&
            arr.references.subsetOf(left.outputSet) &&
            key.references.subsetOf(right.outputSet) && key.references.nonEmpty =>
          (i, arr, key, true)
        // mirrored: array from the right, key from the left
        case (ArrayContains(arr, key), i)
          if mayExplodeRight &&
            arr.deterministic && key.deterministic && atomicElem(arr) &&
            arr.references.subsetOf(right.outputSet) &&
            key.references.subsetOf(left.outputSet) && key.references.nonEmpty =>
          (i, arr, key, false)
      }
      hit match {
        case None => j
        case Some((i, arr, key, arrOnLeft)) =>
          val at = arr.dataType.asInstanceOf[ArrayType]
          val elem = AttributeReference("_contains_elem", at.elementType,
            at.containsNull)()
          val rest = conjuncts.patch(i, Nil, 1)
          val newCond = (EqualTo(elem, key) +: rest).reduce(And)
          val newType = if (jt == Cross) Inner else jt
          val rewritten =
            if (arrOnLeft) {
              val gen = Generate(Explode(ArrayDistinct(arr)), Nil,
                outer = false, None, Seq(elem), left)
              Join(gen, right, newType, Some(newCond), hint)
            } else {
              val gen = Generate(Explode(ArrayDistinct(arr)), Nil,
                outer = false, None, Seq(elem), right)
              Join(left, gen, newType, Some(newCond), hint)
            }
          Project(j.output.toIndexedSeq, rewritten)
      }
  }
}
