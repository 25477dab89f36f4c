package graft

import java.nio.file.Files

class MainSpec extends SparkSpec {

  test("CLI wordcount job over a text container writes R out_<j> kv files") {
    val in = Files.createTempDirectory("cli_in")
    Files.writeString(in.resolve("a.txt"), "The quick brown fox\nthe lazy dog.\n")
    Files.writeString(in.resolve("b.txt"), "THE end\n")
    val out = Files.createTempDirectory("cli_out").toString
    Main.main(Array(
      "--input", in.toString, "--output", out, "--r", "3", "--query", "wordcount"))
    val files = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("out_"))
    assert(files.sorted.toSeq == Seq("out_0", "out_1", "out_2"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val counts = back.select($"key", $"value".cast("long"))
      .as[(String, Long)].collect().toMap
    assert(counts("the") == 3L)
    assert(counts("fox") == 1L)
  }

  test("CLI sql job runs arbitrary SQL with custom functions over the tables") {
    val out = Files.createTempDirectory("cli_sql_out").toString
    Main.main(Array(
      "--input", sf, "--output", out, "--r", "2",
      "--query", "sql",
      "--sql", "SELECT n_name AS key, qdot(array(CAST(0.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS value FROM nation ORDER BY n_name",
      "--key", "key", "--value", "value"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val rows = back.select($"key", $"value".cast("long")).as[(String, Long)].collect().toMap
    assert(rows.size == 25)
    assert(rows.values.forall(_ == 1000000L)) // 500 * 2000
  }
}
