package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Coercions
import graft.operators.SkewJoin

/** ScalaCheck-style property tests for the coercion layer (SURVEY.md
  * §5 recommendation: property tests vs reference semantics, which the
  * reference itself lacks), run in batched DataFrame form. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def genList[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("property: int round-trip — toIntLenient(i.toString) == i") {
    val ints = genList(Gen.chooseNum(Int.MinValue, Int.MaxValue), 300)
    val out = ints.map(_.toString).toDF("s")
      .select(Coercions.toIntLenient($"s").as("i")).collect().map(_.getInt(0))
    assert(out.toSeq == ints)
  }

  test("property: double round-trip and truncation-toward-zero parity") {
    val ds = genList(Gen.chooseNum(-1e6, 1e6), 300)
    val rows = ds.map(_.toString).toDF("s")
      .select(Coercions.toDoubleLenient($"s").as("d"), Coercions.toIntLenient($"s").as("i"))
      .collect()
    rows.zip(ds).foreach { case (r, x) =>
      assert(r.getDouble(0) == x)
      assert(r.getInt(1) == x.toInt, s"trunc of $x") // Python int(float) semantics
    }
  }

  test("property: garbage strings never throw, always null") {
    val garbage = genList(Gen.alphaStr.map(_ + "!x"), 200) ++
      Seq("--", "1.2.3", "e5", "+-2", "0x10")
    val out = garbage.toDF("s").select(
      Coercions.toIntLenient($"s").as("i"),
      Coercions.toDoubleLenient($"s").as("d"),
      Coercions.toDateLenient($"s").as("dt")).collect()
    out.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("property: null tokens are null under any casing/padding") {
    val tokens = for {
      t <- Seq("null", "na", "n/a", "")
      pad <- Seq("", " ", "  ")
      s <- Seq(t.toUpperCase, t.capitalize, t)
    } yield pad + s + pad
    val out = tokens.toDF("s")
      .select(Coercions.normalizeNullTokens($"s").as("v")).collect()
    out.foreach(r => assert(r.isNullAt(0)))
  }

  test("property: codegen'd cosine kernel is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(11L)
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextGaussian() * 3).toFloat)))
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def fold(arr: org.apache.spark.sql.Column) =
        aggregate(arr, lit(0.0), (acc, x) => acc + x)
      val dot = fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
      val na = sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))
      val nb = sqrt(fold(transform(b, x => x.cast("double") * x.cast("double"))))
      when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
    }
    val out = pairs.select(
      graft.functions.VectorKernels.cosine($"a.v", $"b.v").as("k"),
      hofCosine($"a.v", $"b.v").as("h")).collect()
    out.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("property: word-shingle kernel matches the array_distinct/transform HOF") {
    val rnd = new scala.util.Random(5L)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("id", "text")
    val t = graft.operators.TextAnalysis.tokens($"text")
    val hof = array_distinct(transform(
      sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
    val out = docs.filter(size(t) >= 3).select(
      graft.functions.VectorKernels.wordShinglesCol(t, 3).as("k"), hof.as("h")).collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("property: integer centrality is invariant to input partitioning") {
    // the whole point of the integer formulation: a float PageRank's
    // per-partition sum order varies with partitioning; BIGINT sums
    // cannot — identical ranks from any layout of the same corpus
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      graft.operators.GraphRank.similarityCentrality(
          docs.repartition(parts), "doc_id", "text", n = 3, minShared = 1L, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(2) == run(13))
  }

  test("salted join equals plain join") {
    val probe = (1 to 500).map(i => (i % 7, i)).toDF("k", "v")
    val build = Seq((0, "a"), (1, "b"), (2, "c"), (6, "d")).toDF("k", "w")
    val plain = probe.join(build, "k").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedEquiJoin(probe, build, "k", salt = 8,
        probeSaltSource = col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }
}

/** Driver-contract smoke: entry() must return rows on sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every declared query has unique name; oracle keys subset of queries") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

/** The Portable (SQL-reproducible) hash family must stay strictly
  * inside signed-64 range for every input — DuckDB throws on int64
  * overflow, so any wrap would break the oracle at some input. */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("md5-derived words and g_i = h1 + i*h2m never overflow, match 14-hex parse") {
    val rnd = new scala.util.Random(99L)
    val inputs = (Seq("", "a", "é世界") ++
      Seq.fill(200)(rnd.nextString(rnd.nextInt(40)))).distinct
    val df = inputs.toDF("s").select(
      col("s"),
      conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long").as("h1"),
      (conv(substring(md5(col("s")), 15, 14), 16, 10).cast("long") % (1L << 53)).as("h2m"))
    df.collect().foreach { r =>
      val (h1, h2m) = (r.getLong(1), r.getLong(2))
      assert(h1 >= 0 && h1 < (1L << 56))
      assert(h2m >= 0 && h2m < (1L << 53))
      // worst-case hash index
      val g63 = h1 + 63L * h2m
      assert(g63 >= 0 && g63 < (1L << 60), s"g_63 out of range: $g63")
      // h1 equals the reference big-integer parse of the first 14 hex chars
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(14)
      assert(h1 == java.lang.Long.parseLong(hex, 16))
    }
  }

  test("property: cluster collapse equals union-find on random pair graphs") {
    // distributed min-label CC vs a reference union-find — random
    // graphs cover chains, cycles, stars and singletons alike
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference union-find with min-root election
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // min-root normalization: the cluster id is the min member
      val expect = (0 until n).groupBy(find).flatMap { case (_, members) =>
        val m = members.min.toLong; members.map(x => x.toLong -> m)
      }
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      // both execution paths must agree with the reference: the
      // driver-side union-find (default threshold) and the distributed
      // label-propagation loop (forced via maxLocalEdges = 0)
      val got = graft.operators.Dedup.collapseNearDuplicates(docs, pairs, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
      val gotDist = graft.operators.Dedup
        .collapseNearDuplicates(docs, pairs, "doc_id", maxLocalEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expect)
    }
  }

  test("property: weighted sampling is monotone in weight and fate-isolated") {
    import graft.operators.Sampling
    val rnd = new scala.util.Random(91L)
    for (_ <- 1 to 3) {
      val rows = (1L to 120L).map(i => (i, (rnd.nextInt(50) + 1).toLong))
      val df = rows.toDF("id", "w").withColumn("dom", lit("x"))
      val picked = Sampling.weightedSampleKPerStratum(df, "id", "w", "dom", 15)
        .collect().map(_.getLong(0)).toSet
      // raise one selected row's weight: with u fixed, its A-ES key only
      // grows, so it MUST stay selected (everyone else is unchanged)
      val chosen = picked.head
      val boosted = rows.map { case (i, w) => (i, if (i == chosen) w * 10 else w) }
        .toDF("id", "w").withColumn("dom", lit("x"))
      val picked2 = Sampling.weightedSampleKPerStratum(boosted, "id", "w", "dom", 15)
        .collect().map(_.getLong(0)).toSet
      assert(picked2.contains(chosen), s"boosting weight evicted row $chosen")
    }
  }

  test("property: histogram counts always total to the non-null row count") {
    val vals = Iterator.continually(Gen.chooseNum(-500.0, 500.0).sample)
      .flatten.take(400).toSeq
    val c = vals.toDF("v")
      .agg(graft.functions.Histograms.histFixed(col("v"), -100.0, 25.0, 8).as("h"))
      .collect()(0).getSeq[Long](0)
    assert(c.sum == vals.size)       // under/overflow slots catch every value
    assert(c.length == 10)
  }
}
