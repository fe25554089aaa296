package graft

import graft.operators.{Dedup, Flatten, Relational}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.2.3): flatten over arbitrary
  * nested schemas, argmax-with-ties vs brute force, jaccard vs set math. */
object FlattenProps extends Properties("Flatten") {

  private val leafType: Gen[DataType] =
    Gen.oneOf(LongType, StringType, DoubleType, BooleanType)

  private val fieldName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def structGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, fieldName).map(_.distinct)
      fields <- Gen.sequence[List[StructField], StructField](names.map { nm =>
        val dt: Gen[DataType] =
          if (depth <= 0) leafType
          else Gen.frequency(3 -> leafType, 1 -> structGen(depth - 1))
        dt.map(StructField(nm, _))
      })
    } yield StructType(fields)

  private def leafCount(s: StructType): Int = s.fields.map(_.dataType match {
    case st: StructType => leafCount(st)
    case _ => 1
  }).sum

  private def leafPaths(s: StructType, prefix: Seq[String] = Nil): Seq[Seq[String]] =
    s.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => leafPaths(st, prefix :+ f.name)
        case _ => Seq(prefix :+ f.name)
      }
    }

  property("leaf count preserved") = forAll(structGen(3)) { schema =>
    Flatten.flatColumns(schema).size == leafCount(schema)
  }

  property("flat names are sep-joined paths in order") = forAll(structGen(3)) { schema =>
    val got = Flatten.flatColumns(schema, "_").map(_.toString)
    val want = leafPaths(schema).map(_.mkString("_"))
    // Column.toString renders `path AS alias`; compare the alias part.
    got.map(_.split(" AS ").last.stripSuffix("`").stripPrefix("`")) == want
  }

  property("flat on already-flat schema is identity") = forAll(structGen(0)) { schema =>
    Flatten.flatColumns(schema).map(_.toString.split(" AS ").last) ==
      schema.fieldNames.toSeq
  }
}

object RelationalProps extends Properties("Relational") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rows: Gen[List[(String, Long)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(-5L, 5L)))

  property("argmaxWithTies equals brute force") = forAll(rows) { xs =>
    val df = xs.toDF("k", "v")
    val got = Relational.argmaxWithTies(df, col("v"))
      .as[(String, Long)].collect().sorted.toSeq
    val mx = xs.map(_._2).max
    val want = xs.filter(_._2 == mx).sorted
    Prop(got == want) :| s"got=$got want=$want"
  }

  private val tokenSets: Gen[(List[String], List[String])] = {
    val toks = Gen.listOf(Gen.oneOf("x", "y", "z", "w", "v"))
    Gen.zip(toks, toks)
  }

  property("jaccard equals set formula") = forAll(tokenSets) { case (a, b) =>
    val df = Seq((a.distinct, b.distinct)).toDF("a", "b")
    val got = df.select(Dedup.jaccard(col("a"), col("b")).as("j")).as[Double].head()
    val (sa, sb) = (a.toSet, b.toSet)
    val want =
      if ((sa ++ sb).isEmpty) 0.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size
    Prop(math.abs(got - want) < 1e-9) :| s"got=$got want=$want"
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' ')))
      .map(_.mkString)

  property("shingle hash sets are sorted, distinct, and size-bounded") =
    forAll(asciiText, Gen.choose(2, 6)) { (text, k) =>
      val hs = graft.expressions.ShingleHashes.hashWindows(
        text.getBytes("UTF-8"), k).toSeq
      val windows = if (text.isEmpty) 0 else math.max(text.length - k + 1, 1)
      Prop(hs == hs.sorted && hs.distinct == hs && hs.size <= windows) :|
        s"text='$text' k=$k hashes=$hs"
    }

  // TopKByScore must equal sort-then-take under ANY partitioning of the
  // input into partial buffers — the exact contract map-side combine
  // relies on (reduce into shards, merge shards in arbitrary tree order).
  private val scored: Gen[List[(Double, Long)]] = Gen.listOf(
    Gen.zip(Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(-100L, 100L)))

  property("TopKByScore == sort.take(k) under arbitrary sharding") =
    forAll(scored, Gen.choose(1, 6), Gen.choose(1, 5)) { (xs, k, shards) =>
      val agg = new graft.functions.TopKByScore(k)
      val want = xs.distinct.sortBy { case (s, id) => (-s, id) }.take(k)
      // NB: duplicate (score,id) pairs are kept by the aggregator like
      // any SQL aggregate input row — compare on distinct inputs to keep
      // the sort-take reference well-defined.
      val parts = xs.distinct.grouped(math.max(1, (xs.distinct.size + shards - 1) / shards))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val got = parts.foldLeft(agg.zero)(agg.merge)
      Prop(got == want) :| s"xs=${xs.distinct} k=$k got=$got want=$want"
    }
}

/** SCD2 merge invariants over arbitrary dimension/update batches. */
object Scd2Props extends Properties("Scd2") {
  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val dimSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))
  private def df(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), dimSchema)

  private val table: Gen[Map[Long, String]] = Gen.mapOf(
    Gen.zip(Gen.choose(0L, 12L), Gen.oneOf("a", "b", "c")))

  property("every key is current exactly once; versions reflect change status") =
    forAll(table, table) { (cur, upd) =>
      val out = Relational.scd2Merge(
          df(cur.toSeq), df(upd.toSeq), "k", Seq("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
      val byKey = out.groupBy(_._1)
      val allKeys = cur.keySet ++ upd.keySet
      val currentOncePerKey = allKeys.forall(k => byKey(k).count(_._4) == 1)
      val currentIsLatest = allKeys.forall { k =>
        val want = upd.getOrElse(k, cur(k)) // batch wins where present
        byKey(k).find(_._4).exists(_._2 == want)
      }
      val changedGetTwoRows = allKeys.forall { k =>
        val expected = (cur.get(k), upd.get(k)) match {
          case (Some(a), Some(b)) if a != b => 2 // closed v1 + current v2
          case _ => 1 // unchanged, insert-only, or dim-only
        }
        byKey(k).length == expected
      }
      Prop(currentOncePerKey && currentIsLatest && changedGetTwoRows) :|
        s"cur=$cur upd=$upd out=${out.toList}"
    }
}

/** Round-4 extension operator invariants: sort-based quantiles vs the
  * percentile aggregate over arbitrary data, and snapshot-diff algebra. */
object QuantileDiffProps extends Properties("QuantileDiff") {
  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  // Values drawn from a small lattice so ties (the interpolation edge
  // cases) occur often; at least one element so quantiles exist.
  private val values: Gen[List[Double]] = Gen.nonEmptyListOf(
    Gen.choose(0, 40).map(_ * 0.25))
  private val qs: Gen[List[Double]] = Gen.nonEmptyListOf(
    Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.613, 0.75, 0.9, 1.0))

  property("exactQuantiles == percentile() aggregate for arbitrary data") =
    forAll(values, qs) { (xs, quants) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map(Row(_)), 3),
        StructType(Seq(StructField("x", DoubleType))))
      val got = Relational.exactQuantiles(df, "x", quants)
      val want = df.selectExpr(
          s"percentile(x, array(${quants.mkString(",")})) as ps")
        .collect()(0).getSeq[Double](0)
      Prop(got == want.toSeq) :| s"xs=$xs qs=$quants got=$got want=$want"
    }

  private val snap: Gen[Map[Long, (Long, Double)]] = Gen.mapOf(
    Gen.zip(Gen.choose(0L, 15L), Gen.zip(Gen.choose(0L, 3L), Gen.oneOf(1.0, 2.0))))
  private val kvSchema = StructType(Seq(
    StructField("k", LongType), StructField("a", LongType),
    StructField("b", DoubleType)))
  private def sdf(m: Map[Long, (Long, Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        m.toSeq.map { case (k, (a, b)) => Row(k, a, b) }, 2), kvSchema)

  property("snapshotDiff: identity is empty; statuses match set algebra") =
    forAll(snap, snap) { (a, b) =>
      val self = Relational.snapshotDiff(sdf(a), sdf(a), "k").count() == 0
      val out = Relational.snapshotDiff(sdf(a), sdf(b), "k")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val wantAdded = b.keySet -- a.keySet
      val wantRemoved = a.keySet -- b.keySet
      val wantChanged = (a.keySet & b.keySet).filter(k => a(k) != b(k))
      val statuses =
        wantAdded.forall(out.get(_).contains("added")) &&
        wantRemoved.forall(out.get(_).contains("removed")) &&
        wantChanged.forall(out.get(_).contains("changed")) &&
        out.keySet == (wantAdded ++ wantRemoved ++ wantChanged)
      Prop(self && statuses) :| s"a=$a b=$b out=$out"
    }

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("jaroWinkler: range, symmetry, identity, empty convention") =
    forAll(word, word) { (a, b) =>
      val jw = graft.expressions.JaroWinkler.score(a, b)
      val sym = jw == graft.expressions.JaroWinkler.score(b, a)
      val range = jw >= 0.0 && jw <= 1.0
      // Identity is exactly 1 for nonempty strings; anything involving
      // an empty side is exactly 0 (the DuckDB convention er5 relies on).
      val ident = a.isEmpty || graft.expressions.JaroWinkler.score(a, a) == 1.0
      val empty = a.nonEmpty ||
        (jw == 0.0 && graft.expressions.JaroWinkler.score(a, a) == 0.0)
      Prop(sym && range && ident && empty) :| s"a='$a' b='$b' jw=$jw"
    }
}

/** Round-8 sketch invariants: KMV aggregator algebra over arbitrary
  * streams and splits, and the DDSketch integer bucket contract. */
object SketchProps extends Properties("Sketch") {
  import graft.functions.KMinValues

  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1L << 20))
  private val ks: Gen[Int] = Gen.choose(1, 16)

  private def sketch(agg: KMinValues, xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("KMV sketch == sorted distinct take k, any order") =
    forAll(hashes, ks) { (xs, k) =>
      val agg = new KMinValues(k)
      val want = xs.distinct.sorted.take(k)
      val got = sketch(agg, xs)
      val gotShuffled = sketch(agg, xs.reverse)
      Prop(got == want && gotShuffled == want) :|
        s"k=$k xs=$xs got=$got want=$want"
    }

  property("KMV merge(sketch(a), sketch(b)) == sketch(a ++ b), any split") =
    forAll(hashes, hashes, ks) { (a, b, k) =>
      val agg = new KMinValues(k)
      val merged = agg.merge(sketch(agg, a), sketch(agg, b))
      val whole = sketch(agg, a ++ b)
      Prop(merged == whole) :| s"k=$k a=$a b=$b merged=$merged whole=$whole"
    }

  // The q190/st21 bucket contract, in plain Long math (what the SQL
  // shifts compute): lo <= v < lo + width, width == 1 for v < 4, and
  // width/lo <= 1/4 above — the bound behind the 12.5% midpoint claim.
  private def bucket(v: Long): (Long, Long) = {
    val s = math.max(64 - java.lang.Long.numberOfLeadingZeros(v), 3) - 3
    val lo = (v >> s) << s
    (lo, 1L << s)
  }

  property("DDSketch bucket: contains v, width 1 below 4, rel width <= 1/4") =
    forAll(Gen.choose(1L, 1L << 40)) { v =>
      val (lo, w) = bucket(v)
      Prop(lo <= v && v < lo + w &&
        (v >= 4 || w == 1) && (v < 4 || w * 4 <= lo)) :|
        s"v=$v lo=$lo w=$w"
    }
}
