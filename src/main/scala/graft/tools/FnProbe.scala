package graft.tools
import org.apache.spark.sql.SparkSession
object FnProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").appName("probe")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    def t(sql: String): Unit =
      try println(s"OK  $sql => " + s.sql(sql).collect().mkString("|"))
      catch { case e: Throwable => println(s"ERR $sql => ${e.getMessage.take(120)}") }
    t("SELECT approx_top_k(x, 2) FROM VALUES ('a'),('a'),('b') t(x)")
    t("SELECT hex(aes_encrypt('spark', 'abcdefghijklmnop', 'ECB'))")
    t("SELECT cast(aes_decrypt(aes_encrypt('spark','abcdefghijklmnop','ECB'),'abcdefghijklmnop','ECB') AS STRING)")
    t("SELECT from_avro(to_avro(named_struct('a', 1)), schema_of_avro('{\"type\":\"record\",\"name\":\"r\",\"fields\":[{\"name\":\"a\",\"type\":\"int\"}]}'))")
    t("SELECT luhn_check('4111111111111111')")
    t("SELECT try_validate_utf8(x'80')")
    t("SELECT is_valid_utf8(x'80'), make_valid_utf8(x'80')")
    t("SELECT randstr(5, 42), uniform(0, 10, 42)")
    t("SELECT session_user(), current_user()")
    t("SELECT typeof(TIME '12:00:00')")
    t("SELECT time_trunc('HOUR', TIME '12:34:56')")
    t("SELECT approx_top_k_estimate(approx_top_k_accumulate(x), 2) FROM VALUES ('a'),('a'),('b') t(x)")
    s.stop()
  }
}
