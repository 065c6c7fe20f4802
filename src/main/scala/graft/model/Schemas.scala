package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the reference's two input datasets and five
  * output tables (reference `etl.py:47–57`, `README.md:22–34`;
  * FIXTURES.md §A). The song schema is the 10-field *intended* schema —
  * the reference's declared one omits `song_id` yet selects it
  * (`etl.py:65`), which would not analyze; see SURVEY §1.2.
  */
object Schemas {

  /** Song metadata (intended schema; reference `etl.py:47–57` + song_id). */
  val song: StructType = StructType(Seq(
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("artist_id", StringType),
    StructField("artist_name", StringType),
    StructField("artist_location", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType),
    StructField("duration", DoubleType),
    StructField("num_songs", IntegerType),
    StructField("year", IntegerType)))

  /** User-activity log events. The reference *infers* this schema
    * (`etl.py:105`); we declare it (inference is an extra full pass over
    * the input — unacceptable at 100 TB). Types match what inference
    * produces on the README sample (`README.md:32–34`): `userId` stays a
    * string, `ts` an epoch-millisecond long.
    */
  val logEvent: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", LongType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", DoubleType),
    StructField("sessionId", LongType),
    StructField("song", StringType),
    StructField("status", LongType),
    StructField("ts", LongType),
    StructField("userAgent", StringType),
    StructField("userId", StringType)))
}

/** Typed views of the two inputs, for Dataset[T] call sites. */
case class Song(
    song_id: String, title: String, artist_id: String, artist_name: String,
    artist_location: String, artist_latitude: Option[Double],
    artist_longitude: Option[Double], duration: Double,
    num_songs: Int, year: Int)

case class LogEvent(
    artist: Option[String], auth: String, firstName: String, gender: String,
    itemInSession: Long, lastName: String, length: Option[Double],
    level: String, location: String, method: String, page: String,
    registration: Double, sessionId: Long, song: Option[String],
    status: Long, ts: Long, userAgent: String, userId: String)
