package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Constraints, FuzzyJoin, IncrementalAgg,
  Retrieval, Sampling, SchemaEvolution, TopK}

/** Partitioning-invariance properties for the round-5 operators: the
  * same input laid out as 1 partition and as 7 must produce identical
  * output — the property that separates "works on my collect()" from
  * "works on a 1000-executor cluster", since partition count is the
  * one thing a cluster changes for free. Each operator here either
  * aggregates with exact arithmetic (counts, decimals, integer sums),
  * ranks by a total order, or is set-semantics by construction, so
  * bit-identical results are REQUIRED, not hoped for. */
class PartitioningInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def invariant(run: DataFrame => DataFrame, input: DataFrame,
      nonEmpty: Boolean = true): Unit = {
    val one = rowSet(run(input.repartition(1)))
    val seven = rowSet(run(input.repartition(7)))
    assert(one == seven,
      s"partitioning changed the result: only-in-1=${(one -- seven).take(3)} " +
        s"only-in-7=${(seven -- one).take(3)}")
    if (nonEmpty) assert(one.nonEmpty, "degenerate fixture: empty output")
  }

  private val rnd = new scala.util.Random(31L)
  private val names = Vector("alpha house", "alpha mouse", "beta house",
    "gamma grove", "gamma glove", "delta drive", "epsilon lane")

  test("FuzzyJoin.trigramJoin is partitioning-invariant") {
    val left = (1L to 40L).map(i => (i, names(rnd.nextInt(names.size))))
      .toDF("id", "s")
    val right = (1L to 40L).map(i => (i + 100, names(rnd.nextInt(names.size)) +
        (if (i % 3 == 0) "x" else ""))).toDF("id", "s")
    invariant(
      l => FuzzyJoin.trigramJoin(l, "id", "s", right, "id", "s",
        threshold = 0.4, stopGramCap = 64),
      left)
  }

  test("BloomJoin.semiJoin is partitioning-invariant") {
    val probe = (1L to 500L).toDF("k")
    val build = (1L to 500L).filter(_ % 11 == 0).toDF("b")
    // both sides re-laid-out: bloom merge order AND probe layout vary
    invariant(
      p => BloomJoin.semiJoin(p, "k", build.repartition(5), "b", 50L, 0.2),
      probe)
  }

  test("SchemaEvolution.unionEvolved is partitioning-invariant") {
    val g1 = (1 to 50).map(i => (i, i * 10)).toDF("id", "v")
    val g2 = (51 to 100).map(i => (i.toLong, i * 1.5f, s"s$i"))
      .toDF("id", "v", "extra")
    invariant(
      b1 => SchemaEvolution.unionEvolved(Seq(b1, g2.repartition(3))),
      g1)
  }

  test("IncrementalAgg partial+merge is partitioning-invariant") {
    val base = (1 to 300).map(i => (s"k${i % 7}", i * 1.25)).toDF("k", "v")
    val delta = (1 to 90).map(i => (s"k${i % 9}", i * 0.75)).toDF("k", "v")
    invariant(
      b => IncrementalAgg.merge(
        IncrementalAgg.partial(b, Seq("k"), "v"),
        delta.repartition(4), Seq("k"), "v"),
      base)
  }

  test("Constraints.check is partitioning-invariant") {
    val df = (1 to 200).map(i =>
      (i, if (i % 17 == 0) null else s"v${i % 50}", i % 30)).toDF("id", "s", "n")
    invariant(
      d => Constraints.check(d, Seq(
        Constraints.NotNull("s"),
        Constraints.Unique(Seq("s")),
        Constraints.InRange("n", 0, 25),
        Constraints.RowCountBetween(100L, 300L))),
      df)
  }

  test("TopK.perKey is partitioning-invariant") {
    // (score, tie) is a total order per key, so the heap's merge order
    // across partitions cannot show through
    val df = (1L to 400L).map(i => (s"g${i % 5}", (i * 37 % 101).toDouble, i, s"p$i"))
      .toDF("k", "score", "tie", "payload")
    invariant(
      d => TopK.perKey(d, Seq("k"), "score", "tie", Seq("payload"), k = 6),
      df)
  }

  test("Sampling.weightedSampleKPerStratum is partitioning-invariant") {
    // the A-ES key is a pure function of (key, weight); the window's
    // (key desc, id) order is total, so layout cannot show through
    val df = (1L to 300L).map(i => (i, s"d${i % 4}", (i * 13 % 37) + 1L))
      .toDF("id", "dom", "w")
    invariant(
      d => Sampling.weightedSampleKPerStratum(d, "id", "w", "dom", 6),
      df)
  }

  test("Retrieval.rrfFuse is partitioning-invariant") {
    val a = (1L to 30L).map(i => (i, ((i * 7) % 30 + 1).toInt)).toDF("id", "rank")
    val b = (11L to 40L).map(i => (i, ((i * 11) % 30 + 1).toInt)).toDF("id", "rank")
    invariant(
      l => Retrieval.rrfFuse(Seq("a" -> l, "b" -> b.repartition(5)), "id", k = 12),
      a)
  }
}
