package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based SAFETY proofs for the stats machinery, against the
  * REAL pipeline: random rows go through the actual
  * [[NdjsonDataWriter]] (bounds, truncation, NaN flags, null counts),
  * the resulting entry round-trips through the manifest codec
  * ([[ManifestSink.renderEntry]] → [[ManifestSink.parseEntryObj]]),
  * and the two pruning verdicts are checked against a brute-force
  * evaluator with Spark comparison semantics (NaN above everything,
  * NaN = NaN, null never satisfies a comparison):
  *
  *   - `!mayMatch` ⇒ NO row matches (a skipped file loses no rows);
  *   - `mustMatch` ⇒ EVERY row matches (a metadata-DELETEd file held
  *     no survivor — the direction where a false positive DESTROYS
  *     data).
  *
  * Conservatism in the other directions is allowed by construction and
  * not asserted. */
object ManifestStatsProps extends Properties("ManifestStats") {

  // The delete-soundness direction guards against data destruction —
  // buy extra trials (each is one tiny local file write).
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(400)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("x", DoubleType),
    StructField("s", StringType)))

  private case class Row3(id: Option[Long], x: Option[Double],
      s: Option[String])

  // Small domains make boundary collisions (lit == min == max) likely.
  private val idGen: Gen[Option[Long]] =
    Gen.frequency(5 -> Gen.choose(-3L, 3L).map(Some(_)), 1 -> Gen.const(None))
  private val xGen: Gen[Option[Double]] = Gen.frequency(
    5 -> Gen.oneOf(-2.5, -0.0, 0.0, 1.5, 2.5).map(Some(_)),
    1 -> Gen.const(Some(Double.NaN)),
    1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity).map(Some(_)),
    1 -> Gen.const(None))
  private val strGen: Gen[Option[String]] = Gen.frequency(
    5 -> Gen.oneOf("", "a", "ab", "b", "{", "}", "\"q\"", "é世",
      "😀", "a" * 63, "a" * 64, "a" * 70, "zჿFF").map(Some(_)),
    1 -> Gen.const(None))
  private val rowGen: Gen[Row3] =
    for (i <- idGen; x <- xGen; s <- strGen) yield Row3(i, x, s)

  private val litId: Gen[Long] = Gen.choose(-4L, 4L)
  private val litX: Gen[Double] =
    Gen.oneOf(-2.5, 0.0, 1.5, 2.5, Double.NaN, Double.PositiveInfinity)
  private val litS: Gen[String] =
    Gen.oneOf("", "a", "ab", "b", "{", "a" * 64, "a" * 70, "😀")

  private def leafGen: Gen[Filter] = {
    def cmp[A](c: String, lit: Gen[A]): Gen[Filter] = for {
      v <- lit
      f <- Gen.oneOf[Any => Filter](EqualTo(c, _), GreaterThan(c, _),
        GreaterThanOrEqual(c, _), LessThan(c, _), LessThanOrEqual(c, _))
    } yield f(v)
    Gen.oneOf(
      cmp("id", litId), cmp("x", litX), cmp("s", litS),
      Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, litId).map(vs => In("id", vs.map(_.asInstanceOf[Any]).toArray))),
      Gen.oneOf("id", "x", "s").map(IsNull(_)),
      Gen.oneOf("id", "x", "s").map(IsNotNull(_)))
  }

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> (for (a <- filterGen(depth - 1); b <- filterGen(depth - 1)) yield And(a, b)),
      1 -> (for (a <- filterGen(depth - 1); b <- filterGen(depth - 1)) yield Or(a, b)),
      1 -> filterGen(depth - 1).map(Not(_)))

  /** Spark comparison semantics, brute force: null operand → false;
    * NaN equals NaN and sits above every other double; strings compare
    * in UTF8String binary order. */
  private def cmpVals(col: String, row: Row3, lit: Any): Option[Int] =
    col match {
      case "id" => row.id.map(v => java.lang.Long.compare(v, lit.asInstanceOf[Long]))
      case "x" => row.x.map { v =>
        java.lang.Double.compare(v, lit.asInstanceOf[Double])
      }
      case "s" => row.s.map(v => UTF8String.fromString(v)
        .compareTo(UTF8String.fromString(lit.asInstanceOf[String])))
    }

  private def isNull(col: String, row: Row3): Boolean = col match {
    case "id" => row.id.isEmpty
    case "x" => row.x.isEmpty
    case "s" => row.s.isEmpty
  }

  /** SQL three-valued (Kleene) evaluation: a NULL comparison operand
    * yields UNKNOWN (None), which NOT preserves as UNKNOWN — the row
    * "matches" a filter only when it evaluates to definite TRUE. A
    * two-valued NOT here would claim NULL rows match NOT(c = v) and
    * mask exactly the metadata-DELETE null-destruction bug this
    * property exists to catch. */
  private def eval3(f: Filter, row: Row3): Option[Boolean] = f match {
    case EqualTo(c, v) => cmpVals(c, row, v).map(_ == 0)
    case GreaterThan(c, v) => cmpVals(c, row, v).map(_ > 0)
    case GreaterThanOrEqual(c, v) => cmpVals(c, row, v).map(_ >= 0)
    case LessThan(c, v) => cmpVals(c, row, v).map(_ < 0)
    case LessThanOrEqual(c, v) => cmpVals(c, row, v).map(_ <= 0)
    case In(c, vs) =>
      if (isNull(c, row)) None
      else Some(vs.exists(v => cmpVals(c, row, v).contains(0)))
    case IsNull(c) => Some(isNull(c, row))
    case IsNotNull(c) => Some(!isNull(c, row))
    case And(a, b) => (eval3(a, row), eval3(b, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(a, b) => (eval3(a, row), eval3(b, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(a) => eval3(a, row).map(!_)
    case _ => Some(false)
  }

  private def evalRow(f: Filter, row: Row3): Boolean =
    eval3(f, row).contains(true)

  /** Rows → a REAL manifest entry: written through the actual writer,
    * then round-tripped through render/parse (the persistence path). */
  private def entryOf(rows: Seq[Row3]): StagedFile = {
    val dir = Files.createTempDirectory("graft_stats_prop")
    Files.createDirectories(dir.resolve(".staging-p"))
    val w = new NdjsonDataWriter(dir.toString, "p", schema, 0, 0L)
    rows.foreach { r =>
      w.write(new GenericInternalRow(Array[Any](
        r.id.map(Long.box).orNull,
        r.x.map(Double.box).orNull,
        r.s.map(UTF8String.fromString).orNull)))
    }
    val staged = w.commit().asInstanceOf[StagedFile]
    val back = ManifestSink.parseEntryObj(ManifestSink.renderEntry(staged))
    assert(back.isDefined, s"entry must re-parse: ${ManifestSink.renderEntry(staged)}")
    back.get
  }

  property("skip soundness: !mayMatch => no row matches; " +
    "delete soundness: mustMatch => every row matches") =
    forAll(Gen.nonEmptyListOf(rowGen), filterGen(2)) { (rows, f) =>
      val e = entryOf(rows)
      val matches = rows.map(evalRow(f, _))
      val may = ManifestStats.mayMatch(schema, e, f)
      val must = ManifestStats.mustMatch(schema, e, f)
      val skipSound = may || !matches.exists(identity)
      val deleteSound = !must || matches.forall(identity)
      val dual = !must || may
      skipSound && deleteSound && dual
    }

  property("bucket + bounds pruning loses no row through the real write/scan path") =
    forAll(Gen.nonEmptyListOf(rowGen), litId) { (rows, lit) =>
      // Rows land through the REAL partitioned writer (bucket(3, id) —
      // explicit bucket ids in the manifest) and the REAL batch commit;
      // the scan then plans with an id-equality pushed filter. A bucket
      // or bounds prune that drops a qualifying file is UNRECOVERABLE
      // (residual filters only see planned partitions), so every row
      // matching the literal must be served by some planned partition.
      val dir = Files.createTempDirectory("graft_bucket_prop")
      Files.createDirectories(dir.resolve(".staging-b"))
      val w = new PartitionedNdjsonDataWriter(dir.toString, "b", schema,
        Seq("bucket(3,id)"), 0, 0L)
      rows.foreach { r =>
        w.write(new GenericInternalRow(Array[Any](
          r.id.map(Long.box).orNull,
          r.x.map(Double.box).orNull,
          r.s.map(UTF8String.fromString).orNull)))
      }
      new ManifestBatchWrite(dir.toString, schema, "b", truncate = false)
        .commit(Array(w.commit()))
      val sb = new ManifestScanBuilder(dir.toString, schema,
        partCols = Seq("bucket(3,id)"))
      sb.pushFilters(Array[Filter](EqualTo("id", lit)))
      val planned = sb.build().asInstanceOf[ManifestScan]
        .planInputPartitions()
      val got = planned.flatMap { p =>
        val (file, start, end) = p match {
          case mp: ManifestFilePartition => (mp.file, mp.start, mp.end)
          case kp: KeyedManifestFilePartition => (kp.file, kp.start, kp.end)
        }
        val r = new NdjsonPartitionReader(file, start, end, schema)
        val out = collection.mutable.ArrayBuffer[Option[Long]]()
        while (r.next()) {
          val row = r.get()
          out += (if (row.isNullAt(0)) None else Some(row.getLong(0)))
        }
        r.close()
        out
      }
      val expect = rows.count(_.id.contains(lit))
      got.count(_.contains(lit)) == expect
    }

  property("entry round trip preserves rows, bytes, null counts, stats") =
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val dir = Files.createTempDirectory("graft_stats_prop")
      Files.createDirectories(dir.resolve(".staging-p"))
      val w = new NdjsonDataWriter(dir.toString, "p", schema, 0, 0L)
      rows.foreach { r =>
        w.write(new GenericInternalRow(Array[Any](
          r.id.map(Long.box).orNull,
          r.x.map(Double.box).orNull,
          r.s.map(UTF8String.fromString).orNull)))
      }
      val staged = w.commit().asInstanceOf[StagedFile]
      val back = ManifestSink.parseEntryObj(
        ManifestSink.renderEntry(staged)).get
      // The parser orders stats by column name; the writer by schema
      // position — identity up to that ordering.
      back.copy(stats = back.stats.sortBy(_.col)) ==
        staged.copy(stats = staged.stats.sortBy(_.col))
    }
}
