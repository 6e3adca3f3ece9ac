package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level scale contract (VERDICT r9 #3): the handful of
  * deliberately-unrouted quadratic baselines — kept as oracle/law
  * anchors for their routed production forms — must be TAGGED, and
  * every tag must point at a declared Production sibling, so no scale
  * caller can reach a measured-quadratic plan by following the
  * registry. */
class RegistrySpec extends AnyFunSuite {

  test("every Baseline-tagged query has a declared Production sibling") {
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    SparkEntry.registry.foreach { q =>
      q.scaleClass match {
        case Q.Baseline(sib) =>
          val s = byName.get(sib)
          assert(s.isDefined, s"${q.name}: routed sibling $sib is not declared")
          assert(s.get.scaleClass == Q.Production,
            s"${q.name}: sibling $sib must itself be Production, " +
              s"got ${s.get.scaleClass}")
        case Q.Production => ()
      }
    }
  }

  test("the four measured-quadratic baselines are tagged (and only those)") {
    val tagged = SparkEntry.registry.collect {
      case Q(name, _, _, Q.Baseline(sib)) => name -> sib
    }.toMap
    assert(tagged == Map(
      "q43b_jaccard_prefix" -> "q43c_jaccard_adaptive",
      "q216_simhash_neighbors" -> "q216c_simhash_neighbors_routed",
      "q50_embedding_neardup" -> "q50c_embedding_neardup_routed",
      "q222_mutual_nn" -> "q222b_mutual_nn_ivf"))
  }

  test("registry names are unique and every oracle query has a fn") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
  }
}
