package graft

import graft.pipelines.Pipelines
import java.nio.file.Files

/** Full-pipeline parity: the reference's three DAGs run end-to-end over
  * jsonplaceholder-shaped payloads, integrity holds, and the three
  * blog-post queries produce the expected answers over the warehouse. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val usersPayload =
    """[{"id": 1, "name": "Ann", "username": "ann", "email": "ann@x.com",
      |  "address": {"street": "Main St", "suite": "A1", "city": "S", "zipcode": "1",
      |    "geo": {"lat": "1.5", "lng": "2.5"}},
      |  "phone": "1", "website": "a.com",
      |  "company": {"name": "Acme", "catchPhrase": "do", "bs": "syn"}},
      | {"id": 2, "name": "Bob", "username": "bob", "email": "bob@x.com",
      |  "address": {"street": "Elm St", "suite": "B2", "city": "S", "zipcode": "2",
      |    "geo": {"lat": "3.5", "lng": "4.5"}},
      |  "phone": "2", "website": "b.com",
      |  "company": {"name": "Acme", "catchPhrase": "do", "bs": "syn"}}]""".stripMargin

  private val postsPayload =
    """[{"userId": 1, "id": 10, "title": "t10", "body": "b10"},
      | {"userId": 1, "id": 11, "title": "t11", "body": "b11"},
      | {"userId": 2, "id": 20, "title": "t20", "body": "b20"}]""".stripMargin

  private val commentsPayload =
    """[{"postId": 10, "id": 100, "name": "c1", "email": "ann@x.com", "body": "nice"},
      | {"postId": 10, "id": 101, "name": "c2", "email": "ghost@x.com", "body": "longest body"},
      | {"postId": 11, "id": 102, "name": "c3", "email": "ghost@x.com", "body": "ok"},
      | {"postId": 20, "id": 103, "name": "c4", "email": "ann@x.com", "body": "hm"}]""".stripMargin

  test("three-DAG flow end-to-end: stage, normalize, load, validate, query") {
    val staging = Files.createTempDirectory("graft_staging").toString
    val wh = Files.createTempDirectory("graft_wh").toString

    val userReports = Pipelines.usersEtl(spark, usersPayload, staging, wh)
    assert(userReports.forall(_.ok), userReports.toString)
    assert(userReports.find(_.table == "companies").get.rows == 1) // Acme deduped

    val postsReport = Pipelines.postsEtl(spark, postsPayload, wh)
    assert(postsReport.ok && postsReport.rows == 3)

    val commentsReport = Pipelines.commentsEtl(spark, commentsPayload, wh)
    assert(commentsReport.ok && commentsReport.rows == 4)

    val (topCommenter, perPost, longest) = Pipelines.warehouseQueries(spark, wh)

    // Query (a): ann and ghost tie at 2 comments; ghost is unregistered
    // (NULL user_id through the right join).
    val top = topCommenter.collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(top == Set((Some(1L), "ann@x.com", 2L), (None, "ghost@x.com", 2L)))

    // Query (b): comments per post, ordered by post id.
    assert(perPost.as[(Long, Long)].collect().toSeq ==
      Seq((10L, 2L), (11L, 1L), (20L, 1L)))

    // Query (c): single longest comment body.
    assert(longest.as[(Long, Long)].collect().toSeq ==
      Seq((101L, "longest body".length.toLong)))
  }

  test("idempotent reload: running the load twice leaves identical state") {
    val staging = Files.createTempDirectory("graft_staging2").toString
    val wh = Files.createTempDirectory("graft_wh2").toString
    Pipelines.usersEtl(spark, usersPayload, staging, wh)
    val first = spark.read.parquet(s"$wh/users.parquet").collect().toSet
    val again = Pipelines.usersEtl(spark, usersPayload, staging, wh)
    assert(again.forall(_.ok))
    assert(spark.read.parquet(s"$wh/users.parquet").collect().toSet == first)
  }
}
