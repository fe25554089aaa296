package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's transform layer (`/root/reference/dags/users_etl.py:88-118`,
  * `posts_etl.py:92-94`, `comments_etl.py:92-94`) re-expressed as pure
  * `DataFrame => DataFrame` stages — set-oriented, no row loops.
  *
  * Deliberate deviation (SURVEY §2.B P5): the reference mints `uuid4()`
  * surrogate keys per address/company row (`users_etl.py:103-108`), which is
  * nondeterministic and couples parent/child rows through Python object
  * identity (`:114-115`). We derive the key as `sha2(natural columns)`, so
  * both the dimension row and the user row compute the same key
  * independently — same uniqueness/join contract, no join, deterministic
  * under retries and oracle comparison.
  */
object RefPipeline {

  // Separator / NULL sentinel outside the data's alphabet, so field
  // boundaries and NULLs are unambiguous: ("ab","c") vs ("a","bc") and
  // NULL vs "" produce different keys.
  private val nullSentinel = "\u0000"
  private val keySep = "\u0001"

  /** Deterministic surrogate key over natural columns. */
  private def surrogateKey(cols: String*) =
    sha2(concat_ws(keySep, cols.map(c => coalesce(col(c), lit(nullSentinel))): _*), 256)

  /** Raw nested user records → normalized (users, addresses, companies).
    * Mirrors `users_etl.py:88-118`: pop address/company, flatten
    * address.geo, cast geo strings → double, propagate FKs. */
  def normalizeUsers(raw: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val addresses = raw.select(
        surrogateKey("address.street", "address.suite", "address.city",
          "address.zipcode", "address.geo.lat", "address.geo.lng").as("uuid"),
        col("address.street").as("street"),
        col("address.suite").as("suite"),
        col("address.city").as("city"),
        col("address.zipcode").as("zipcode"),
        col("address.geo.lat").cast("double").as("geo_lat"),
        col("address.geo.lng").cast("double").as("geo_lng"))
      .dropDuplicates("uuid")

    val companies = raw.select(
        surrogateKey("company.name", "company.catchPhrase", "company.bs").as("uuid"),
        col("company.name").as("name"),
        col("company.catchPhrase").as("catchPhrase"),
        col("company.bs").as("bs"))
      .dropDuplicates("uuid")

    val users = raw.select(
      col("id"), col("name"), col("username"), col("email"),
      surrogateKey("address.street", "address.suite", "address.city",
        "address.zipcode", "address.geo.lat", "address.geo.lng").as("address_uuid"),
      col("phone"), col("website"),
      surrogateKey("company.name", "company.catchPhrase", "company.bs").as("company_uuid"))

    (users, addresses, companies)
  }

  /** `posts_etl.py:92-94`: camelCase → snake_case for the DB. */
  def normalizePosts(raw: DataFrame): DataFrame =
    raw.withColumnRenamed("userId", "user_id")
      .select("user_id", "id", "title", "body")

  /** `comments_etl.py:92-94`. */
  def normalizeComments(raw: DataFrame): DataFrame =
    raw.withColumnRenamed("postId", "post_id")
      .select("post_id", "id", "name", "email", "body")

  /** Surrogate-key column for a company struct — exposed for tests that
    * check FK propagation (P6) equals the dimension key (P5). */
  private[graft] def surrogateKeyFor(cols: String*) = surrogateKey(cols: _*)
}
