package graft.ext

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, triangles, and separate components resolve to min labels") {
    // components: {1,2,3} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges within the iteration cap (label hops)") {
    // path graph 0-1-2-...-12: min label must travel the full diameter
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 13)
    assert(got.values.forall(_ === 0L))
  }
}
