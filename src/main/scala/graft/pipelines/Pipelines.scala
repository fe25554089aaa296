package graft.pipelines

import graft.operators.{RefPipeline, Relational}
import graft.sources.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline runners mirroring the reference's three DAGs
  * (`/root/reference/dags/{users,posts,comments}_etl.py`) — the §2.D
  * orchestration surface as plain Scala sequencing: Spark's lazy DAG
  * already models the data dependencies, so "orchestration" reduces to
  * stage order + validation barriers.
  *
  * Stage mapping (users ETL, `users_etl.py:171-229`):
  *   sense → [[Ingest.fetchJson]] (driver-side, bounded retry = the
  *     HttpSensor + retry policy);
  *   stage → both staged layouts the reference writes (NDJSON branch
  *     parallel to array-JSON, `users_etl.py:229`);
  *   transform → [[RefPipeline.normalizeUsers]] (pure plan, no action);
  *   load → [[Ingest.writeStar]] (parents before children, atomic
  *     overwrite per table = DELETE-then-INSERT idempotence);
  *   validate → FK/PK checks the reference declares as constraints
  *     (`blog_post_definitions.sql:43-81`) run as queries here, acting
  *     as the post-load barrier the Postgres constraints provided.
  */
object Pipelines {

  /** Per-run summary — counts after load, with integrity results. */
  final case class LoadReport(
      table: String, rows: Long, fkOrphans: Long, pkDuplicates: Long) {
    def ok: Boolean = fkOrphans == 0 && pkDuplicates == 0
  }

  /** Users ETL: payload JSON string → staged layouts → normalized star →
    * parquet warehouse → integrity reports. */
  def usersEtl(spark: SparkSession, payload: String,
      stagingDir: String, warehouseDir: String): Seq[LoadReport] = {
    val raw = Ingest.readJsonString(spark, payload)
    // Stage both layouts (the reference's parallel NDJSON branch).
    Ingest.writeNdjson(raw, s"$stagingDir/users_ndjson")
    Ingest.writeJsonArray(raw, s"$stagingDir/users.json")

    // Pin the staged read to the raw schema: no inference pass, no
    // run-to-run schema drift in the warehouse.
    val staged = Ingest.readNdjson(spark, s"$stagingDir/users_ndjson", Some(raw.schema))
    val (users, addresses, companies) = RefPipeline.normalizeUsers(staged)
    Ingest.writeStar(users, addresses, companies, warehouseDir)

    val u = spark.read.parquet(s"$warehouseDir/users.parquet")
    val a = spark.read.parquet(s"$warehouseDir/addresses.parquet")
    val c = spark.read.parquet(s"$warehouseDir/companies.parquet")
    Seq(
      LoadReport("addresses", a.count(),
        0L, Relational.pkDuplicates(a, "uuid").count()),
      LoadReport("companies", c.count(),
        0L, Relational.pkDuplicates(c, "uuid").count()),
      LoadReport("users", u.count(),
        Relational.fkOrphans(u, "address_uuid", a, "uuid").count() +
          Relational.fkOrphans(u, "company_uuid", c, "uuid").count(),
        Relational.pkDuplicates(u, "id").count()))
  }

  /** Posts ETL (`posts_etl.py`): rename → load → FK check vs users. */
  def postsEtl(spark: SparkSession, payload: String,
      warehouseDir: String): LoadReport = {
    val posts = RefPipeline.normalizePosts(Ingest.readJsonString(spark, payload))
    Ingest.writeParquetOverwrite(posts, s"$warehouseDir/posts.parquet")
    val p = spark.read.parquet(s"$warehouseDir/posts.parquet")
    val users = spark.read.parquet(s"$warehouseDir/users.parquet")
    LoadReport("posts", p.count(),
      Relational.fkOrphans(p, "user_id", users, "id").count(),
      Relational.pkDuplicates(p, "id").count())
  }

  /** Comments ETL (`comments_etl.py`): rename → load → FK check vs posts. */
  def commentsEtl(spark: SparkSession, payload: String,
      warehouseDir: String): LoadReport = {
    val comments = RefPipeline.normalizeComments(Ingest.readJsonString(spark, payload))
    Ingest.writeParquetOverwrite(comments, s"$warehouseDir/comments.parquet")
    val cm = spark.read.parquet(s"$warehouseDir/comments.parquet")
    val posts = spark.read.parquet(s"$warehouseDir/posts.parquet")
    LoadReport("comments", cm.count(),
      Relational.fkOrphans(cm, "post_id", posts, "id").count(),
      Relational.pkDuplicates(cm, "id").count())
  }

  /** The reference's three analytic queries over the loaded warehouse —
    * the post-ETL query surface (`sql/blog_post_queries.sql`). */
  def warehouseQueries(spark: SparkSession, warehouseDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val users = spark.read.parquet(s"$warehouseDir/users.parquet")
    val comments = spark.read.parquet(s"$warehouseDir/comments.parquet")
    (graft.queries.RefQueries.topCommenter(users, comments),
      graft.queries.RefQueries.commentsPerPost(comments),
      graft.queries.RefQueries.longestComments(comments))
  }
}
