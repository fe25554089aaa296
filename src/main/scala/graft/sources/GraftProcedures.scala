package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** The table-maintenance SQL front door — Spark 4's native procedure
  * API (`ProcedureCatalog` + the `CALL` statement), the Iceberg
  * `CALL catalog.system.rewrite_data_files(...)` shape:
  *
  * {{{
  * CALL cat.system.compact('db.t', 100000)
  * CALL cat.system.expire_snapshots('db.t', 3)
  * CALL cat.system.vacuum('db.t')              -- 7-day default age
  * SHOW PROCEDURES IN cat.system
  * }}}
  *
  * Each procedure resolves the dotted table name inside THIS catalog's
  * base directory, runs the corresponding `ManifestSink`/`ManifestOps`
  * maintenance operation at CALL EXECUTION (never at analysis — an
  * EXPLAIN must not compact anything, which is why these are
  * procedures and not table-valued functions), and returns its counts
  * as a one-row result. */
private[sources] object GraftProcedures {

  private def longParam(n: String, comment: String): ProcedureParameter =
    ProcedureParameter.in(n, LongType).comment(comment).build()
  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("dotted table name inside this catalog, e.g. 'db.t'").build()

  private def specResult(old: Seq[String], next: Seq[String])
      : java.util.Iterator[Scan] =
    result(StructType(Seq(
      StructField("old_spec", StringType, nullable = false),
      StructField("new_spec", StringType, nullable = false))),
      Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(old.mkString(",")),
        org.apache.spark.unsafe.types.UTF8String.fromString(next.mkString(","))))

  private def result(schema: StructType, vals: Array[Any])
      : java.util.Iterator[Scan] =
    java.util.List.of(new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(vals))
      override def readSchema(): StructType = schema
    }: Scan).iterator()

  /** `(catalog base, dotted name) -> table directory`, refusing names
    * that resolve no manifest table. */
  private def dirOf(base: Path, table: String): String = {
    val parts = table.split("\\.").toSeq
    parts.foreach(p => require(!p.contains("/") && !p.contains("\\") &&
      p != ".." && p.nonEmpty, s"invalid table name part: '$p'"))
    val dir = parts.foldLeft(base)(_.resolve(_))
    require(Files.exists(GraftCatalog.metaPath(dir)),
      s"no table '$table' under $base")
    dir.toString
  }

  def all(base: Path): Map[String, UnboundProcedure] = Map(
    "commit_all" -> new UnboundProcedure {
      override def name(): String = "commit_all"
      override def description(): String =
        "make every txnStage-staged write across the named tables " +
          "visible at ONE commit point (all-or-nothing; see GraftTxn)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "commit_all"
          override def parameters(): Array[ProcedureParameter] =
            Array(
              ProcedureParameter.in("txn", StringType)
                .comment("transaction id the writes were staged with " +
                  "(.option(\"txnStage\", id))").build(),
              ProcedureParameter.in("tables", StringType)
                .comment("comma-separated dotted table names inside " +
                  "this catalog, e.g. 'db.users,db.addresses'").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val id = input.getUTF8String(0).toString
            val dirs = input.getUTF8String(1).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq
              .map(t => dirOf(base, t))
            val committed = GraftTxn.commitAll(
              base.resolve("_txns").toString, dirs, id)
            result(StructType(Seq(
              StructField("tables_committed", IntegerType, nullable = false),
              StructField("generations", StringType, nullable = false))),
              Array[Any](committed.size,
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  committed.map(_._2).mkString(","))))
          }
        }
    },
    "cluster" -> new UnboundProcedure {
      override def name(): String = "cluster"
      override def description(): String =
        "rewrite the table range-partitioned and sorted by the given " +
          "columns (one atomic overwrite); tightens per-file bounds for " +
          "pruning and stamps the sort so scans report it " +
          "(SupportsReportOrdering)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "cluster"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam,
              ProcedureParameter.in("sort_cols", StringType)
                .comment("comma-separated column names to sort by").build(),
              longParam("target_files",
                "number of range-partitioned output files"))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val cols = input.getUTF8String(1).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq
            val n = input.getLong(2).toInt
            val (schema, _, _) =
              GraftCatalog.readMeta(java.nio.file.Paths.get(dir))
            cols.foreach(c => require(schema.fields.exists(_.name == c),
              s"cluster: column '$c' is not in the table schema"))
            val spark = org.apache.spark.sql.SparkSession.active
            ManifestOps.cluster(spark, dir, schema,
              cols.map(org.apache.spark.sql.functions.col), n,
              sortByNames = cols)
            result(StructType(Seq(
              StructField("files_written", IntegerType, nullable = false))),
              Array[Any](ManifestSink.committedFiles(dir).size))
          }
        }
    },
    "zorder" -> new UnboundProcedure {
      override def name(): String = "zorder"
      override def description(): String =
        "rewrite the table laid out by the Morton interleave of 2-4 " +
          "dimensions (one atomic overwrite); the rewritten files' " +
          "min/max boxes make file/block skipping prune " +
          "multi-dimensional box predicates (see ManifestOps.zorder)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "zorder"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam,
              ProcedureParameter.in("zorder_cols", StringType)
                .comment("comma-separated 2-4 integral/temporal columns " +
                  "to interleave").build(),
              longParam("target_files",
                "number of range-partitioned output files"),
              ProcedureParameter.in("bits_per_dim", LongType)
                .defaultValue("8")
                .comment("Morton bits per dimension (2-16; 8 = 256 " +
                  "buckets per dimension)").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val cols = input.getUTF8String(1).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq
            val n = input.getLong(2).toInt
            val bits = input.getLong(3).toInt
            val (schema, _, _) =
              GraftCatalog.readMeta(java.nio.file.Paths.get(dir))
            val spark = org.apache.spark.sql.SparkSession.active
            val used = ManifestOps.zorder(spark, dir, schema, cols, n, bits)
            result(StructType(Seq(
              StructField("files_written", IntegerType, nullable = false),
              StructField("bits_per_dim", IntegerType, nullable = false))),
              Array[Any](ManifestSink.committedFiles(dir).size, used))
          }
        }
    },
    "compact" -> new UnboundProcedure {
      override def name(): String = "compact"
      override def description(): String =
        "bin-pack files below target_rows into fewer files (one atomic swap); " +
          "materializes deletion vectors of the files it merges; optional " +
          "partition scope 'k=v[,k2=v2]' restricts to one partition — at " +
          "100 TB maintenance runs on the hot partition, not the table"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "compact"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, longParam("target_rows",
              "files with fewer rows than this are merge candidates"),
              ProcedureParameter.in("scope", StringType)
                .defaultValue("''")
                .comment("'' = whole table; 'lang=en' / 'day=2024-01-01' " +
                  "/ 'bucket(8,id)=3' = only files recorded in that " +
                  "partition").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val scopeTxt =
              if (input.isNullAt(2)) "" else input.getUTF8String(2).toString
            val merged =
              if (scopeTxt.trim.isEmpty)
                ManifestSink.compact(dir, input.getLong(1))
              else {
                // User values arrive unquoted; recorded part.* literals
                // are typed JSON — match either the raw token (numbers,
                // bucket ids) or the string rendering.
                val scope = scopeTxt.split(",").map(_.trim)
                  .filter(_.nonEmpty).map { kv =>
                    val eq = kv.lastIndexOf('=')
                    require(eq > 0, s"scope entry '$kv' is not k=v")
                    kv.substring(0, eq).trim -> kv.substring(eq + 1).trim
                  }.toMap
                val matched = collection.mutable.Map[String, String]()
                val entries = ManifestSink.committedEntries(dir)
                scope.foreach { case (k, v) =>
                  val quoted = "\"" + NdjsonCodec.escape(v) + "\""
                  val hit = entries.flatMap(_.partValues.get(k)).distinct
                    .find(rec => rec == v || rec == quoted)
                  matched(k) = hit.getOrElse(v)
                }
                ManifestSink.compactPartition(dir, input.getLong(1),
                  matched.toMap)
              }
            result(StructType(Seq(
              StructField("merged_files", IntegerType, nullable = false))),
              Array[Any](merged))
          }
        }
    },
    "expire_snapshots" -> new UnboundProcedure {
      override def name(): String = "expire_snapshots"
      override def description(): String =
        "drop retained generations beyond keep_last and GC files only they reference"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "expire_snapshots"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam,
              longParam("keep_last", "how many newest generations to keep"))
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val (files, gens) =
              ManifestSink.expireSnapshots(dir, input.getLong(1).toInt)
            result(StructType(Seq(
              StructField("data_files_deleted", IntegerType, nullable = false),
              StructField("generations_dropped", IntegerType, nullable = false))),
              Array[Any](files, gens))
          }
        }
    },
    "create_tag" -> new UnboundProcedure {
      override def name(): String = "create_tag"
      override def description(): String =
        "name a generation (default: current) as an expiry-proof tag, " +
          "readable via VERSION AS OF '<tag>'"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "create_tag"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam,
              ProcedureParameter.in("tag", StringType)
                .comment("non-numeric tag name").build(),
              ProcedureParameter.in("generation", LongType)
                .defaultValue("-1")
                .comment("generation to tag; -1 = current").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val gen = ManifestSink.createTag(dir,
              input.getUTF8String(1).toString,
              Some(input.getLong(2)).filter(_ >= 0))
            result(StructType(Seq(
              StructField("tagged_generation", LongType, nullable = false))),
              Array[Any](gen))
          }
        }
    },
    "create_branch" -> new UnboundProcedure {
      override def name(): String = "create_branch"
      override def description(): String =
        "fork the current state into a writable branch (hard-linked files, " +
          "own manifest); read/write it via the branch=<name> option"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "create_branch"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("branch", StringType)
              .comment("branch name").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            ManifestOps.createBranch(dir, input.getUTF8String(1).toString)
            result(StructType(Seq(
              StructField("created", BooleanType, nullable = false))),
              Array[Any](true))
          }
        }
    },
    "fast_forward" -> new UnboundProcedure {
      override def name(): String = "fast_forward"
      override def description(): String =
        "publish a branch's file set as the parent's next generation " +
          "(refused if the parent advanced since the fork)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "fast_forward"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("branch", StringType)
              .comment("branch name").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val gen = ManifestOps.fastForward(dir,
              input.getUTF8String(1).toString)
            result(StructType(Seq(
              StructField("current_generation", LongType, nullable = false))),
              Array[Any](gen))
          }
        }
    },
    "drop_branch" -> new UnboundProcedure {
      override def name(): String = "drop_branch"
      override def description(): String =
        "delete a branch and its unpublished work"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "drop_branch"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("branch", StringType)
              .comment("branch name").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val existed = ManifestOps.dropBranch(dir,
              input.getUTF8String(1).toString)
            result(StructType(Seq(
              StructField("existed", BooleanType, nullable = false))),
              Array[Any](existed))
          }
        }
    },
    "restore" -> new UnboundProcedure {
      override def name(): String = "restore"
      override def description(): String =
        "republish a retained/tagged generation (numeric or tag name) as " +
          "the new current — history moves forward, the restored-from " +
          "state stays reachable"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "restore"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("version", StringType)
              .comment("generation number or tag name").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val v = input.getUTF8String(1).toString
            val gen =
              if (v.nonEmpty && v.forall(_.isDigit)) v.toLong
              else ManifestSink.readTags(dir).getOrElse(v,
                throw new IllegalArgumentException(
                  s"no tag '$v'; tags: " +
                    ManifestSink.readTags(dir).keys.toSeq.sorted
                      .mkString(", ")))
            val now = ManifestSink.restore(dir, gen)
            result(StructType(Seq(
              StructField("restored_generation", LongType, nullable = false),
              StructField("current_generation", LongType, nullable = false))),
              Array[Any](gen, now))
          }
        }
    },
    "drop_tag" -> new UnboundProcedure {
      override def name(): String = "drop_tag"
      override def description(): String =
        "drop a tag; its generation becomes expirable again"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "drop_tag"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("tag", StringType)
              .comment("tag name to drop").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val existed = ManifestSink.dropTag(dir,
              input.getUTF8String(1).toString)
            result(StructType(Seq(
              StructField("existed", BooleanType, nullable = false))),
              Array[Any](existed))
          }
        }
    },
    "add_partition_field" -> new UnboundProcedure {
      override def name(): String = "add_partition_field"
      override def description(): String =
        "partition-spec evolution: append a field (e.g. 'bucket(4,doc_id)') " +
          "to the table's partition spec — metadata only, no file rewrites; " +
          "old files keep pruning under the spec they recorded"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "add_partition_field"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("field", StringType)
              .comment("'col' (identity) or 'bucket(n,col)'").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val field = PartSpec.parse(input.getUTF8String(1).toString).name
            val current = GraftCatalog.readMeta(Paths.get(dir))._2
            require(!current.map(PartSpec.parse(_).name).contains(field),
              s"partition field '$field' already in spec " +
                current.mkString("(", ", ", ")"))
            val old = GraftCatalog.replacePartitionSpec(Paths.get(dir),
              current :+ field)
            specResult(old, current :+ field)
          }
        }
    },
    "drop_partition_field" -> new UnboundProcedure {
      override def name(): String = "drop_partition_field"
      override def description(): String =
        "partition-spec evolution: remove a field from the table's partition " +
          "spec — metadata only; existing files keep their recorded tuples"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "drop_partition_field"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("field", StringType)
              .comment("'col' (identity) or 'bucket(n,col)'").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val field = PartSpec.parse(input.getUTF8String(1).toString).name
            val current = GraftCatalog.readMeta(Paths.get(dir))._2
            require(current.map(PartSpec.parse(_).name).contains(field),
              s"partition field '$field' not in spec " +
                current.mkString("(", ", ", ")"))
            val next = current.filterNot(PartSpec.parse(_).name == field)
            val old = GraftCatalog.replacePartitionSpec(Paths.get(dir), next)
            specResult(old, next)
          }
        }
    },
    "replace_partition_spec" -> new UnboundProcedure {
      override def name(): String = "replace_partition_spec"
      override def description(): String =
        "partition-spec evolution: replace the whole spec (comma list; '' = " +
          "unpartitioned) — metadata only, no file rewrites"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "replace_partition_spec"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("spec", StringType)
              .comment("e.g. 'lang' or 'day,bucket(64,user_id)' or ''").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val next = PartSpec.splitList(input.getUTF8String(1).toString)
            val old = GraftCatalog.replacePartitionSpec(Paths.get(dir), next)
            specResult(old, next)
          }
        }
    },
    "refresh_mv" -> new UnboundProcedure {
      override def name(): String = "refresh_mv"
      override def description(): String =
        "fold the base table's generation delta into a materialized " +
          "view's partial log (O(delta), exactly-once; see MaterializedViews)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "refresh_mv"
          override def parameters(): Array[ProcedureParameter] =
            Array(ProcedureParameter.in("mv_table", StringType)
              .comment("dotted name of the MV's PARTIAL table (the one " +
                "createAvg/createTopK maintains), e.g. 'db.base_mv'").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val spark = org.apache.spark.sql.SparkSession.active
            val (from, to) = MaterializedViews.refreshDir(spark, Paths.get(dir))
            result(StructType(Seq(
              StructField("from_generation", LongType, nullable = false),
              StructField("to_generation", LongType, nullable = false))),
              Array[Any](from, to))
          }
        }
    },
    "vacuum" -> new UnboundProcedure {
      override def name(): String = "vacuum"
      override def description(): String =
        "age-guarded GC of unreferenced data files, DV sidecars, and crashed staging dirs"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "vacuum"
          override def parameters(): Array[ProcedureParameter] =
            Array(tableParam, ProcedureParameter.in("older_than_ms", LongType)
              .defaultValue(String.valueOf(7L * 24 * 3600 * 1000))
              .comment("only files older than this are collected").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val dir = dirOf(base, input.getUTF8String(0).toString)
            val (data, staging) = ManifestOps.vacuum(dir, input.getLong(1))
            result(StructType(Seq(
              StructField("data_files_deleted", IntegerType, nullable = false),
              StructField("staging_dirs_deleted", IntegerType, nullable = false))),
              Array[Any](data, staging))
          }
        }
    })
}
