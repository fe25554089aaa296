package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Seeded randomized end-to-end fuzz of the deletion-vector machinery
  * against an in-memory model: random interleavings of appends, SQL
  * DELETEs (point-set and range — exercising both the metadata-only
  * and the position-delta routes), merge-on-read UPDATEs and MERGEs,
  * snapshot tags + RESTOREs (the model keeps per-tag copies),
  * equality deletes, staged cross-table-txn appends, column RENAMEs
  * (fresh name each time; every vintage keeps resolving), CODEC flips
  * (plain and gzip'd files interleave; compaction transcodes), and
  * compaction (vector materialization) must leave the table exactly
  * equal to a HashMap replaying the same operations. Reads re-verify
  * under an adversarially small split size so vector application is
  * also checked across split boundaries. Fixed seeds keep failures
  * reproducible. */
class DeletionVectorFuzzSpec extends SparkSpec {

  private def runScenario(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory(s"graft_dvfuzz_$seed").toString
    val cat = s"gdvf$seed"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", wh)
    // retainHistory: the change-feed REPLAY invariant below needs every
    // window endpoint resolvable.
    // blockbytes=512: every file — plain AND compressed — closes
    // multiple stat blocks, so the adversarial-split reads below run
    // the round-14 frame-aligned seekable-codec path (physical frame
    // seeks + logical-offset row identity) under every DML interleaving.
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('deletionVectors'='true', 'retainHistory'='true',
      'blockbytes'='512')""")
    val model = collection.mutable.HashMap[Long, Long]()
    // The value column's CURRENT name: random RENAMEs (round 13) give
    // it a fresh name mid-sequence — every later op, split read and
    // CDF replay must keep resolving rows written under EVERY vintage.
    var vName = "v"
    // The table's current codec: random flips (round 13) interleave
    // plain and gzip'd files in one table; compaction transcodes.
    var codec = ""
    // Tagged snapshots: tag name -> the model AS OF the tag, for
    // replaying a random RESTORE later in the sequence.
    val snapshots = collection.mutable.HashMap[String, Map[Long, Long]]()
    // Per-generation model snapshots for the CHANGE-FEED REPLAY
    // invariant: from ANY recorded generation g, state(g) + the CDF
    // window (g, current] must reconstruct the CURRENT model exactly —
    // one property covering DV deltas, retire/add re-emission, pure
    // compaction no-ops, restores, and the round-13 equality-delete
    // emit legs, under every random interleaving.
    val genModels = collection.mutable.HashMap[Long, Map[Long, Long]]()
    var nextId = 0L
    val dir = java.nio.file.Paths.get(wh, "t").toString

    def check(tag: String): Unit = {
      val got = spark.sql(s"SELECT id, $vName FROM $cat.t").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(got.length == got.map(_._1).distinct.length,
        s"[seed=$seed $tag] duplicate ids surfaced")
      assert(got.toMap == model.toMap,
        s"[seed=$seed $tag] table diverged from model: " +
          s"extra=${(got.toMap -- model.keys).take(5)} " +
          s"missing=${(model.toMap -- got.map(_._1)).take(5)}")
      // Same rows under a tiny split size: vectors must apply
      // identically across split boundaries (byte-offset identity).
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(vName,
          org.apache.spark.sql.types.LongType)))
      val split = spark.read.format("graft.sources.ManifestSink")
        .schema(schema).option("path", dir)
        .option("maxSplitBytes", (64 + rnd.nextInt(256)).toString).load()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(split == model.toMap, s"[seed=$seed $tag] split read diverged")
    }

    (0 until 8).foreach { step =>
      val opCase = rnd.nextInt(12)
      if (sys.env.contains("GRAFT_FUZZ_TRACE"))
        println(s"[fz] seed=$seed step=$step case=$opCase gen=" +
          graft.sources.ManifestSink.committedGeneration(dir))
      opCase match {
        case 0 | 1 => // append a fresh batch (always possible)
          val n = 20 + rnd.nextInt(60)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            val v = rnd.nextLong() & 0xFFFFFFL
            model(id) = v
            (id, v)
          }
          import spark.implicits._
          rows.toDF("id", vName)
            .repartition(1 + rnd.nextInt(3))
            .writeTo(s"$cat.t").append()
        case 2 if model.nonEmpty => // point-set DELETE (delta route)
          val ids = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(8)) ++ Seq(nextId + 999) // plus a miss
          spark.sql(
            s"DELETE FROM $cat.t WHERE id IN (${ids.mkString(",")})")
          ids.foreach(model.remove)
        case 3 if model.nonEmpty => // range DELETE (may go metadata-only)
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.length))
          val hi = lo + rnd.nextInt(30)
          spark.sql(s"DELETE FROM $cat.t WHERE id >= $lo AND id <= $hi")
          keys.filter(k => k >= lo && k <= hi).foreach(model.remove)
        case 4 if model.nonEmpty => // merge-on-read UPDATE
          val ids = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(6))
          spark.sql(s"UPDATE $cat.t SET $vName = $vName * 2 + 1 " +
            s"WHERE id IN (${ids.mkString(",")})")
          ids.foreach(id => model(id) = model(id) * 2 + 1)
        case 5 if model.nonEmpty => // merge-on-read MERGE (upsert + kill)
          val upd = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(4))
          val kill = rnd.shuffle((model.keySet -- upd).toSeq)
            .take(rnd.nextInt(3))
          val ins = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextLong() & 0xFFFFFFL)
          }
          import spark.implicits._
          (upd.map(id => (id, model(id) + 17L, "u")) ++
            kill.map(id => (id, 0L, "k")) ++
            ins.map { case (id, v) => (id, v, "i") })
            .toDF("id", "nv", "op").createOrReplaceTempView(s"fz_src_$seed")
          spark.sql(s"""MERGE INTO $cat.t t USING fz_src_$seed s
            ON t.id = s.id
            WHEN MATCHED AND s.op = 'k' THEN DELETE
            WHEN MATCHED THEN UPDATE SET $vName = s.nv
            WHEN NOT MATCHED THEN INSERT (id, $vName) VALUES (s.id, s.nv)""")
          upd.foreach(id => model(id) = model(id) + 17L)
          kill.foreach(model.remove)
          ins.foreach { case (id, v) => model(id) = v }
        case 6 if model.nonEmpty => // tag the current state
          val tag = s"fz${seed}s$step"
          spark.sql(s"CALL $cat.system.create_tag('t', '$tag')")
          snapshots(tag) = model.toMap
        case 7 if snapshots.nonEmpty => // restore a random tagged state
          val tag = rnd.shuffle(snapshots.keys.toSeq).head
          spark.sql(s"CALL $cat.system.restore('t', '$tag')")
          model.clear()
          model ++= snapshots(tag)
        case 8 if model.nonEmpty => // EQUALITY DELETE (applied at read)
          import spark.implicits._
          val ids = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(6)) ++ Seq(nextId + 777) // plus a miss
          graft.sources.ManifestOps.equalityDelete(dir,
            ids.toDF("id"), retain = true)
          ids.foreach(model.remove)
        case 9 => // cross-table-txn machinery on ONE table: staged
          // append invisible until commitAll's journal commit point.
          import spark.implicits._
          val id0 = nextId
          val rows = (0 until 5 + rnd.nextInt(10)).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextLong() & 0xFFFFFFL)
          }
          val txn = graft.sources.GraftTxn.newId()
          rows.toDF("id", vName).write
            .format("graft.sources.ManifestSink")
            .option("path", dir)
            .option(graft.sources.GraftTxn.StageOptionKey, txn)
            .mode("append").save()
          // Staged rows must NOT be visible yet.
          assert(spark.sql(
            s"SELECT count(*) FROM $cat.t WHERE id >= $id0")
            .head.getLong(0) == 0L,
            s"[seed=$seed step=$step] staged txn rows leaked")
          graft.sources.GraftTxn.commitAll(
            java.nio.file.Paths.get(wh, "_txns").toString, Seq(dir), txn)
          rows.foreach { case (id, v) => model(id) = v }
        case 10 => // CODEC FLIP (round 13): later appends write the new
          // codec; mixed files coexist and compaction transcodes — the
          // model is codec-blind by construction.
          codec = codec match {
            case "" | "none" => "gzip"
            case "gzip" => "zstd"
            case _ => "none"
          }
          spark.sql(
            s"ALTER TABLE $cat.t SET TBLPROPERTIES ('codec'='$codec')")
        case 11 => // RENAME the value column (round 13): a fresh name
          // each time (renamed-away names are permanently retired) —
          // every row written under ANY vintage must keep resolving,
          // through eqdeletes, DVs, compaction, restores and CDF.
          val nn = s"v${step}_$seed"
          spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN $vName TO $nn")
          vName = nn
        case _ => // op needs state it lacks: compact instead
          graft.sources.ManifestSink.compact(dir, targetRows = 200L)
      }
      if (rnd.nextInt(3) == 0) // interleave vector materialization
        graft.sources.ManifestSink.compact(dir, targetRows = 500L)
      check(s"step=$step")

      // CHANGE-FEED REPLAY INVARIANT: record this generation's model,
      // then replay a random earlier window and demand it reconstructs
      // the present. Replay semantics: apply the window's deletes, then
      // its inserts (an update's delete+insert pair lands the new value).
      val cur = graft.sources.ManifestSink.committedGeneration(dir)
      genModels(cur) = model.toMap
      val resolvable = genModels.keys.filter(g => g < cur &&
        (g == 0L || Files.exists(
          java.nio.file.Paths.get(dir, f"manifest-g$g%06d.json")))).toSeq
      if (resolvable.nonEmpty && rnd.nextInt(2) == 0) {
        val g = resolvable(rnd.nextInt(resolvable.length))
        val cdfSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(vName,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType)))
        val changes = spark.read.format("graft.sources.ManifestSink")
          .schema(cdfSchema).option("path", dir)
          .option("readChangeFeed", "true")
          .option("startingVersion", g.toString)
          .option("endingVersion", cur.toString)
          .load().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        val replayed = genModels(g) --
          changes.collect { case (id, _, "delete") => id } ++
          changes.collect { case (id, v, "insert") => id -> v }
        assert(replayed == model.toMap,
          s"[seed=$seed step=$step] CDF replay ($g, $cur] diverged: " +
            s"extra=${(replayed -- model.keys).take(5)} " +
            s"missing=${(model.toMap -- replayed.keys).take(5)}")
      }
    }
    spark.sql(s"DROP TABLE $cat.t")
  }

  (0L to 7L).foreach { seed =>
    test(s"DV fuzz: random DML/compaction sequence matches the model (seed=$seed)") {
      runScenario(seed)
    }
  }
}
