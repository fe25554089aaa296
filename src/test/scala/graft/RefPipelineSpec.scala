package graft

import graft.operators.{RefPipeline, Relational}
import graft.queries.RefQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity: normalization pipeline (SURVEY §2.B) and the three
  * blog-post queries (§2.C) on jsonplaceholder-shaped fixtures. */
class RefPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def geo(lat: String, lng: String) = Row(lat, lng)
  private def addr(street: String, suite: String, city: String, zip: String,
      lat: String, lng: String) = Row(street, suite, city, zip, geo(lat, lng))
  private def comp(name: String, cp: String, bs: String) = Row(name, cp, bs)

  private val userSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("website", StringType),
    StructField("address", StructType(Seq(
      StructField("street", StringType), StructField("suite", StringType),
      StructField("city", StringType), StructField("zipcode", StringType),
      StructField("geo", StructType(Seq(
        StructField("lat", StringType), StructField("lng", StringType))))))),
    StructField("company", StructType(Seq(
      StructField("name", StringType), StructField("catchPhrase", StringType),
      StructField("bs", StringType))))))

  private lazy val rawUsers = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "Ann", "ann", "ann@x.com", "1", "a.com",
        addr("Main St", "Apt 1", "Springfield", "11111", "1.5", "-2.5"),
        comp("Acme", "do things", "synergy")),
      Row(2L, "Bob", "bob", "bob@x.com", "2", "b.com",
        addr("Main St", "Apt 2", "Springfield", "11111", "3.5", "4.5"),
        comp("Acme", "do things", "synergy")), // same company as Ann
      Row(3L, "Cid", "cid", "cid@x.com", "3", "c.com",
        addr("Elm St", null, "Shelbyville", "22222", "9.0", "8.0"),
        comp("Globex", "innovate", "disrupt")))),
    userSchema)

  test("normalizeUsers: distinct dimensions, FK propagation, geo cast") {
    val (users, addresses, companies) = RefPipeline.normalizeUsers(rawUsers)
    assert(companies.count() == 2) // Acme deduped across Ann/Bob
    assert(addresses.count() == 3)
    assert(users.count() == 3)
    assert(addresses.schema("geo_lat").dataType == DoubleType)

    // FK propagation: user's company_uuid matches the Acme dimension row.
    val acmeUuid = companies.where(col("name") === "Acme")
      .select("uuid").as[String].head()
    val annCompany = users.where(col("id") === 1)
      .select("company_uuid").as[String].head()
    assert(annCompany == acmeUuid)

    // Integrity validators pass on the normalized output.
    assert(Relational.fkOrphans(users, "company_uuid", companies, "uuid").count() == 0)
    assert(Relational.fkOrphans(users, "address_uuid", addresses, "uuid").count() == 0)
    assert(Relational.pkDuplicates(companies, "uuid").count() == 0)
  }

  test("surrogate keys: field boundaries and NULL vs empty are unambiguous") {
    val a = Seq(("ab", "c"), ("a", "bc")).toDF("x", "y")
      .select(RefPipeline.surrogateKeyFor("x", "y").as("k")).as[String].collect()
    assert(a.distinct.length == 2) // ("ab","c") != ("a","bc")
    val b = Seq((Some(""), "z"), (Option.empty[String], "z")).toDF("x", "y")
      .select(RefPipeline.surrogateKeyFor("x", "y").as("k")).as[String].collect()
    assert(b.distinct.length == 2) // NULL != ""
  }

  test("normalizePosts / normalizeComments rename to snake_case") {
    val posts = Seq((10L, 1L, "t", "b")).toDF("userId", "id", "title", "body")
    assert(RefPipeline.normalizePosts(posts).columns.toSeq ==
      Seq("user_id", "id", "title", "body"))
    val comments = Seq((5L, 1L, "n", "e@x.com", "body"))
      .toDF("postId", "id", "name", "email", "body")
    assert(RefPipeline.normalizeComments(comments).columns.toSeq ==
      Seq("post_id", "id", "name", "email", "body"))
  }

  test("query (a): top commenter keeps ties and unregistered emails (right join)") {
    val users = Seq((1L, "u1@x.com"), (2L, "u2@x.com")).toDF("id", "email")
    val comments = Seq(
      (1L, "u1@x.com"), (2L, "u1@x.com"),
      (3L, "ghost@x.com"), (4L, "ghost@x.com"), // tie, not a registered user
      (5L, "u2@x.com")).toDF("id", "email")
    val out = RefQueries.topCommenter(users, comments)
      .select("user_id", "email", "comment_count")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (Some(1L), "u1@x.com", 2L),
      (None, "ghost@x.com", 2L))) // NULL user_id exactly as Postgres right join
  }

  test("query (c): longest comments preserve ties") {
    val comments = Seq((1L, "aaaa"), (2L, "bbbb"), (3L, "cc"))
      .toDF("id", "body")
    val out = RefQueries.longestComments(comments)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 4L), (2L, 4L)))
  }
}
