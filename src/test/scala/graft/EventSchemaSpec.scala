package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parses the reference's captured GetRecords fixture
  * (/root/reference/record.json — a Python repr dump whose Data fields
  * hold the raw JSON payloads) through the declared nested schema, and
  * checks the flatten projection against the reference's flattened form
  * (event.py naming).
  */
class EventSchemaSpec extends SparkSpec {

  /** The payload bytes-literals, unescaped (only \' and \n occur). */
  lazy val payloads: Seq[String] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/record.json")))
    val re = "(?s)b'(.*?)'(?=,\\s*'PartitionKey')".r
    re.findAllMatchIn(txt).map(_.group(1)
      .replace("\\'", "'").replace("\\n", "\n")).toSeq
  }

  lazy val parsed = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataset(payloads)(org.apache.spark.sql.Encoders.STRING)
      .toDF("payload")
    EventSchema.parse(df, col("payload")).select("event.*")
  }

  test("record.json yields 10 payloads, all parse under the declared schema") {
    assert(payloads.size === 10)
    val rows = parsed.collect()
    assert(rows.length === 10)
    // a failed from_json yields a null struct — every payload must parse
    assert(parsed.filter(col("event_id").isNull).count() === 0)
    assert(parsed.filter(col("event_type") === "view").count() === 10)
  }

  test("nested leaves: login_status, device chain, search presence") {
    val statuses = parsed.select(EventSchema.loginStatus(col("visit.login_status")))
      .collect().map(_.getString(0))
    assert(statuses.count(_ == "guest") === 3)
    assert(statuses.count(_ == "logged in") === 7)
    val ws = parsed.select(EventSchema.websphereId(col("visit.login_status")))
      .collect().map(r => Option(r.getString(0)))
    val ids = ws.flatten
    assert(ids.length === 7) // one per logged-in event
    assert(ids.forall(_.matches("\\d+-\\d+")), ids.mkString(","))
    assert(parsed.filter(col("pageview.search").isNotNull).count() === 3)
    assert(parsed.filter(col("page_event") === "search").count() === 3)
    // search events are tagged in message_event_types (record.json:19)
    assert(parsed.filter(array_contains(col("message_event_types"), "search"))
      .count() === 3)
  }

  test("data_quality array explodes to the producer-side issue rows") {
    val n = parsed.select(explode(col("data_quality")).as("dq")).count()
    assert(n === 6) // 1+1+0+0+0+2+1+0+1+0 across the 10 events
  }

  test("query_string_array pairs convert to a lookup map") {
    val withMap = parsed.withColumn("qm",
      EventSchema.queryStringMap(col("pageview.query_string_array")))
    // every event with a non-empty pair array must produce a same-size map
    val bad = withMap.filter(size(col("pageview.query_string_array")) > 0 &&
      size(map_keys(col("qm"))) =!= size(col("pageview.query_string_array")))
    // duplicate keys would shrink the map; assert none of the fixture hits it
    assert(bad.count() === 0)
  }

  test("generic flatten matches the reference's underscore naming (event.py)") {
    val flat = EventSchema.flatten(parsed)
    val names = flat.schema.fieldNames.toSet
    // spot the exact names event.py:10-16 uses
    assert(names.contains("visit_tealium_session_id"))
    assert(names.contains("visit_login_status"))
    assert(names.contains("visit_device_useragent"))
    assert(names.contains("visit_device_user_websphere_id"))
    assert(names.contains("pageview_query_string_array")) // arrays stay nested
    // no struct columns survive the flatten
    assert(!flat.schema.fields.exists(_.dataType.isInstanceOf[StructType]))
    // values survive: flattened leaf == nested access
    val a = parsed.select(col("visit.device.user.websphere_id")).collect().toSeq
    val b = flat.select(col("visit_device_user_websphere_id")).collect().toSeq
    assert(a === b)
  }

  test("flatten round-trips the synthesized nested events") {
    val ev = Tables.events(spark, sf0001).limit(200)
    val flat = operators.Events.flattenedEvents(ev)
    val expected = ev
      .select(col("event_id"),
        when(col("user_id") % 3 === 0, lit("guest"))
          .otherwise(concat(lit("logged in:u"), col("user_id"))).as("ls"))
    val joined = flat.join(expected, "event_id")
      .filter(col("visit_login_status") =!= col("ls"))
    assert(joined.count() === 0)
  }
}
