package graft.queries

import graft.{QuerySpec, Tables}
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's entire query surface
  * (`/root/reference/sql/blog_post_queries.sql:1-38`, per README.md:19-25)
  * — executed by Postgres there, by this engine here.
  *
  * Two forms:
  *  - literal DataFrame programs over the reference's social-media schema
  *    (used by the fixture tests with jsonplaceholder-shaped data);
  *  - harness-table analogs registered in [[graft.SparkEntry]] with DuckDB
  *    oracles, exercising the identical operator patterns (grouped count,
  *    argmax-with-ties, right outer join, scalar subquery, ORDER BY) on
  *    the driver's parquet tables.
  */
object RefQueries {

  // ---- literal reference queries (fixture-tested) ----

  /** Query (a) `blog_post_queries.sql:4-21`: user(s) whose email has the
    * most comments; RIGHT join keeps top commenter emails that match no
    * registered user (NULL user_id). Ties preserved (R9). */
  def topCommenter(users: DataFrame, comments: DataFrame): DataFrame = {
    val counts = comments.groupBy(col("email"))
      .agg(count(lit(1)).as("comment_count"))
    val top = Relational.argmaxWithTies(counts, col("comment_count"))
    users.join(top, Seq("email"), "right_outer")
      .select(col("id").as("user_id"), col("email"), col("comment_count"))
  }

  /** Query (b) `blog_post_queries.sql:26-29`: comments per post. */
  def commentsPerPost(comments: DataFrame): DataFrame =
    comments.groupBy(col("post_id"))
      .agg(count(lit(1)).as("comment_count"))
      .orderBy(col("post_id"))

  /** Query (c) `blog_post_queries.sql:33-38`: the longest comment(s) —
    * all rows attaining max length(body), ties preserved. */
  def longestComments(comments: DataFrame): DataFrame =
    Relational.argmaxWithTies(
        comments.select(col("id"), col("body"), length(col("body")).cast("long").as("body_length")),
        col("body_length"))
      .select(col("id"), col("body_length"))

  // ---- harness-table analogs (driver-oracled) ----

  val specs: Seq[QuerySpec] = Seq(
    // (a) analog: events≈comments, user_id≈email, customer≈users.
    QuerySpec(
      "ref_a_top_commenter",
      """WITH counts AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id),
        |top AS (
        |  SELECT * FROM counts
        |  WHERE n_events = (SELECT max(n_events) FROM counts))
        |SELECT c.c_name AS c_name, t.user_id AS user_id, t.n_events AS n_events
        |FROM customer c RIGHT JOIN top t ON c.c_custkey = t.user_id""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val top = Relational.argmaxWithTies(counts, col("n_events"))
      Tables.customer(s, dir)
        .join(top, col("c_custkey") === col("user_id"), "right_outer")
        .select(col("c_name"), col("user_id"), col("n_events"))
    },

    // (b) analog: line items per order, totally ordered.
    QuerySpec(
      "ref_b_counts_per_group",
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy(col("l_orderkey"))
    },

    // (c) analog: the longest document(s), ties preserved.
    QuerySpec(
      "ref_c_longest_doc",
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_length
        |FROM documents
        |WHERE length(text) = (SELECT max(length(text)) FROM documents)""".stripMargin) { (s, dir) =>
      Relational.argmaxWithTies(
          Tables.documents(s, dir)
            .select(col("doc_id"), length(col("text")).cast("long").as("text_length")),
          col("text_length"))
    },

    // R11: FK/PK integrity as anti-join / grouped-dup validators — both
    // empty ⇔ integrity holds; the oracle proves the validator itself.
    QuerySpec(
      "ref_fk_orphans",
      """SELECT l.l_orderkey AS l_orderkey, l.l_linenumber AS l_linenumber
        |FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin) { (s, dir) =>
      Relational.fkOrphans(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber")),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"))
    },
    QuerySpec(
      "ref_pk_duplicates",
      """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_rows
        |FROM orders GROUP BY o_orderkey HAVING count(*) > 1""".stripMargin) { (s, dir) =>
      Relational.pkDuplicates(Tables.orders(s, dir), "o_orderkey")
    }
  )
}
