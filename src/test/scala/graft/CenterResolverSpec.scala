package graft

import graft.operators.CenterResolver

class CenterResolverSpec extends SparkSpec {
  import spark.implicits._

  private val centers = Seq(
    (1, "Mount Sinai"), (2, "Cedars-Sinai"), (3, "University of Chicago"))
    .toDF("center_id", "name")

  private def resolveAll(names: (Long, String)*): Map[Long, (Option[Int], String)] =
    CenterResolver.resolve(
        names.toDF("id", "center_name"), "id", "center_name", centers,
        aliases = Seq("MSSM" -> "Mount Sinai", "UChicago" -> "University of Chicago"),
        threshold = 0.8)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getInt(2))), r.getString(3))).toMap

  test("ladder: alias → exact → fuzzy → unresolved (Ratcliff-Obershelp scorer)") {
    val out = resolveAll(
      (1L, "mount_sinai"),            // normalized exact (underscore → space)
      (2L, "MSSM"),                   // alias → exact
      (3L, "Cedars Sinai"),           // fuzzy (0.917 ≥ 0.8)
      (4L, "totally unknown place"),  // unresolved
      (5L, "CEDARS-SINAI"))           // case-folded exact
    assert(out(1L) == (Some(1), "exact"))
    assert(out(2L) == (Some(1), "exact"))
    assert(out(3L) == (Some(2), "fuzzy"))
    assert(out(4L) == (None, "unresolved"))
    assert(out(5L) == (Some(2), "exact"))
  }

  test("fuzzy argmax picks the best-scoring center deterministically") {
    val out = resolveAll((1L, "univ of chicago"))
    assert(out(1L) == (Some(3), "fuzzy"))
  }
}
