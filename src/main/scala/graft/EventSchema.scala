package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's clickstream event schema and its flattened projection
  * (SURVEY §1.2-1.3; reference record.json:3 for the nested form,
  * event.py:1-37 for the flattened form).
  *
  * The schema is declared explicitly (schema-on-read like the reference's
  * json.loads, but typed): `from_json(payload, schema)` gives Catalyst the
  * nested StructType, so nested-field access prunes to exactly the leaves
  * a query touches (`spark.sql.optimizer.nestedSchemaPruning.enabled`).
  */
object EventSchema {

  /** pageview.search — present only when page_event = 'search'
    * (reference record.json:19).
    */
  val searchSchema: StructType = StructType(Seq(
    StructField("search_term", StringType),
    StructField("search_results", StringType),
    StructField("search_category", StringType),
    StructField("page_title", StringType),
    StructField("multisearch_keywords", ArrayType(StringType)),
    StructField("multisearch_count", StringType),
    StructField("search_term_original", StringType),
    StructField("itemlist_beginindex", IntegerType),
    StructField("itemlist_pagesize", IntegerType),
    StructField("search_filter", StringType)))

  /** The full nested event (reference record.json:3 et seq.). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_name", StringType),
    StructField("event_type", StringType),
    StructField("event_id", StringType),
    StructField("record_id", StringType),
    StructField("page_event", StringType),
    StructField("event_time", LongType),
    StructField("server_time", LongType),
    StructField("event_date_time", StringType),
    StructField("event_time_processed", StringType),
    StructField("visit", StructType(Seq(
      StructField("tealium_session_id", StringType),
      StructField("login_status", StringType),
      StructField("device", StructType(Seq(
        StructField("useragent", StringType),
        StructField("rendering_reference", StringType),
        StructField("visitor_id", StringType),
        StructField("user", StructType(Seq(
          StructField("user_id", StringType),
          StructField("websphere_id", StringType)))))))))),
    StructField("pageview", StructType(Seq(
      StructField("title", StringType),
      StructField("page_name_identifier", StringType),
      StructField("referrer", StringType),
      StructField("referrer_query", StringType),
      StructField("page_url", StringType),
      StructField("page_name", StringType),
      StructField("query_string", StringType),
      StructField("query_string_krypto", StringType),
      StructField("site_version", StringType),
      StructField("site_platform", StringType),
      StructField("query_string_array", ArrayType(ArrayType(StringType))),
      StructField("search", searchSchema)))),
    StructField("message_event_types", ArrayType(StringType)),
    StructField("data_quality", ArrayType(StructType(Seq(
      StructField("record_id", StringType),
      StructField("event_id", StringType),
      StructField("issue_details", StringType),
      StructField("field_name", StringType),
      StructField("field_value", StringType)))))))

  /** Parse a JSON payload column with the declared schema. */
  def parse(df: DataFrame, jsonCol: Column): DataFrame =
    df.withColumn("event", from_json(jsonCol, eventSchema))

  /** Generic recursive flatten: every nested struct leaf becomes a
    * top-level column named by the underscore-joined path
    * (`visit.device.user.websphere_id` → `visit_device_user_websphere_id`,
    * matching the reference's event.py:16 naming); arrays stay nested
    * (event.py:27-37 keeps them nested too). Pure projection — Catalyst
    * prunes unreferenced leaves at the scan.
    */
  def flattenColumns(schema: StructType, prefix: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val name = path.replace(".", "_")
      f.dataType match {
        case s: StructType => flattenColumns(s, path)
        case _ => Seq(col(path).as(name))
      }
    }

  def flatten(df: DataFrame): DataFrame =
    df.select(flattenColumns(df.schema): _*)

  /** login_status parse (SURVEY F6; reference event.py:11): 'guest' or
    * 'logged in:<websphere_id>' → (status, websphere_id).
    */
  def loginStatus(c: Column): Column =
    split(c, ":").getItem(0)

  def websphereId(c: Column): Column =
    when(regexp_extract(c, "^logged in:(.+)$", 1) === "", lit(null))
      .otherwise(regexp_extract(c, "^logged in:(.+)$", 1))

  /** query_string_array (array<array<string>> of k/v pairs, reference
    * event.py:27-31) → map<string,string> (SURVEY F7). Values are
    * %-unescaped (application/x-www-form-urlencoded: %XX escapes and
    * '+' → space), since real query strings arrive percent-encoded.
    * DELIBERATE DEVIATION from the reference, which keeps values
    * percent-encoded (no unquote/parse_qs anywhere in consumer.py) —
    * documented in SURVEY F7. try_url_decode, not url_decode: a single
    * malformed %-sequence in real data must yield a null value for that
    * key, not fail the whole query (a failure mode the reference's
    * no-decode pipeline cannot hit, so we must not introduce it).
    * Keys in the reference shape are bare identifiers and stay as-is.
    */
  def queryStringMap(c: Column): Column =
    map_from_entries(transform(c, p =>
      struct(p.getItem(0).as("key"), try_url_decode(p.getItem(1)).as("value"))))
}
