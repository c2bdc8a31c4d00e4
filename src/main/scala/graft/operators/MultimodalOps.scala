package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, partition-wise "decode" (STUBBED deterministic fake — the
  * container has no image/audio codecs; the Spark-side schema,
  * partitioning, typed-Dataset batch shape and metadata flow are real),
  * frame sampling, and base64 transport encoding.
  * Beyond-reference surface (SURVEY.md §7 step 5).
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** typed record for the decode pipeline: (id, payload bytes) */
  final case class MediaBytes(doc_id: Long, payload: Array[Byte])

  /** typed "decoded" metadata record */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_byte: Double)

  // metadata projection over binary payloads — pure expressions
  private val mmMeta: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).as("b0"),
        (lit(64) + col("n_chars") % 512).cast("int").as("width"),
        (lit(64) + (col("n_chars") * 7) % 512).cast("int").as("height"),
        lit(3).as("channels"))
      .orderBy(col("doc_id"))

  private val mmMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS b0,
      |  CAST(64 + n_chars % 512 AS INTEGER) AS width,
      |  CAST(64 + (n_chars * 7) % 512 AS INTEGER) AS height,
      |  3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Partition-wise decode pipeline over a typed Dataset of binary
    * payloads. The decode body is a clearly-marked deterministic STUB
    * (no codec libs in this container); everything around it — binary
    * column handling, encoder schemas, per-partition batch iteration —
    * is the real shape a libjpeg/ffmpeg-backed decoder would drop into.
    * Rows-only check (stub semantics are engine-internal).
    */
  private val mmDecodeStub: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaBytes]
      .mapPartitions { batch =>
        // STUB decoder: replace with a real codec call per record.
        batch.map { m =>
          val bytes = m.payload
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xFF); i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          MediaMeta(m.doc_id,
            width = 64 + (bytes.length % 512),
            height = 64 + ((bytes.length * 7) % 512),
            channels = 3,
            mean_byte = math.round(mean * 1e6) / 1e6)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  // deterministic frame sampling from a fake video payload
  private val mmFrameSample: Q = (s, dir) =>
    load(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        explode(sequence(lit(0), least(lit(4), floor(col("n_chars") / 100)).cast("int"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))).as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val mmFrameSampleSql =
    """WITH f AS (
      |  SELECT doc_id, CAST(unnest(generate_series(0, least(4, n_chars // 100))) AS INTEGER) AS frame_idx
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id, frame_idx,
      |  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // base64 transport encoding round-trip over binary payload slices
  private val mmBase64: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        base64(substring(col("text"), 1, 30).cast("binary")).as("b64"),
        unbase64(base64(substring(col("text"), 1, 30).cast("binary"))).cast("string").as("rt"))
      .orderBy(col("doc_id"))

  private val mmBase64Sql =
    """SELECT doc_id,
      |  to_base64(encode(substr(text, 1, 30))) AS b64,
      |  decode(from_base64(to_base64(encode(substr(text, 1, 30))))) AS rt
      |FROM documents ORDER BY doc_id""".stripMargin

  /** payload chunking: split each document's payload into fixed 64-byte
    * tiles with positions — the storage layout for range-fetching large
    * media objects (chunks compared as hex; ASCII corpus keeps byte and
    * char offsets aligned so the VARCHAR-sliced oracle is exact). */
  private val mmChunk: Q = (s, dir) =>
    load(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), floor((length(col("text")) - 1) / 64).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        upper(hex(encode(col("text").substr(col("chunk_idx") * 64 + 1, lit(64)), "UTF-8"))).as("chunk_hex"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val mmChunkSql =
    """SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
      |  upper(hex(encode(substr(text, ci * 64 + 1, 64)))) AS chunk_hex
      |FROM (SELECT doc_id, text,
      |        unnest(generate_series(0, CAST(floor((length(text) - 1) / 64) AS BIGINT))) AS ci
      |      FROM documents WHERE doc_id < 200)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_meta" -> mmMeta,
    "mm_decode_stub" -> mmDecodeStub,
    "mm_frame_sample" -> mmFrameSample,
    "mm_chunk_payload" -> mmChunk,
    "mm_base64" -> mmBase64)

  val oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_chunk_payload" -> mmChunkSql,
    "mm_base64" -> mmBase64Sql)
}
