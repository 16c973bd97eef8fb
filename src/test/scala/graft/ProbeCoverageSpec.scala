package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must be reachable by ScaleProbe: a query
  * absent from every probe family list is SILENTLY dropped by the
  * `only` filter, so its scale behavior would never get measured and
  * PERF.md's "probed at N×" claims would quietly stop covering it.
  * This pins the lists to the registry in both directions. */
class ProbeCoverageSpec extends AnyFunSuite {
  test("every registered query appears in exactly one ScaleProbe family") {
    val all = ScaleProbe.DocQueries ++ ScaleProbe.EventQueries ++
      ScaleProbe.RelQueries ++ ScaleProbe.DualInputQueries
    assert(all.distinct.size == all.size,
      s"duplicated across probe families: ${all.diff(all.distinct).distinct}")
    val registered = SparkEntry.queries.keySet
    val probed = all.toSet
    assert((registered -- probed).isEmpty,
      s"registered but never probed: ${(registered -- probed).toSeq.sorted}")
    assert((probed -- registered).isEmpty,
      s"probe lists name unknown queries: ${(probed -- registered).toSeq.sorted}")
  }
}
