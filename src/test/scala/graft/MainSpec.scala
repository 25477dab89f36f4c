package graft

import java.nio.file.Files

/** A user's custom mapper/reducer pair, exactly as someone outside the
  * engine would write them: plain classes implementing the two traits,
  * submitted to the CLI by fully-qualified name. */
class TestVowelCountMapper extends api.TextMapper {
  def map(record: String): IterableOnce[(String, String)] =
    record.toLowerCase(java.util.Locale.ROOT)
      .filter("aeiou".contains(_))
      .map(v => (v.toString, "1"))
}

class TestSumReducer extends api.TextReducer {
  def reduce(key: String, values: Iterator[String]): String =
    values.map(_.toLong).sum.toString
}

class MainSpec extends SparkSpec {

  test("CLI custom job: user mapper/reducer classes submitted by FQCN end-to-end") {
    val in = Files.createTempDirectory("cli_custom_in")
    Files.writeString(in.resolve("a.txt"), "Education\nqueue\n")
    val out = Files.createTempDirectory("cli_custom_out").toString
    Main.main(Array(
      "--input", in.toString, "--output", out, "--r", "2",
      "--query", "custom",
      "--mapper-class", "graft.TestVowelCountMapper",
      "--reducer-class", "graft.TestSumReducer",
      "--key", "key", "--value", "value"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val counts = back.select($"key", $"value".cast("long"))
      .as[(String, Long)].collect().toMap
    // education -> e,u,a,i,o ; queue -> u,e,u,e
    assert(counts == Map("a" -> 1L, "e" -> 3L, "i" -> 1L, "o" -> 1L, "u" -> 3L))
  }

  test("CustomJob.run plans exactly one exchange — the reduce shuffle IS the R partitioning") {
    import spark.implicits._
    val lines = Seq("Education", "queue", "banana").toDS()
    val out = api.CustomJob.run(lines, new TestVowelCountMapper, new TestSumReducer, 3)
    out.collect()
    // the AQE string repeats the plan under "== Initial Plan =="
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(plan).length == 1, s"plan:\n$plan")
    assert(out.rdd.getNumPartitions == 3)
  }

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

  test("CLI expr job: wordcount submitted purely as SQL expression strings") {
    // the reference's "POST map.py/reduce.py at submit time"
    // (`w6/docs/design.md:66-74`) with zero compiled code: the mapper is
    // an ARRAY<STRUCT<key,value>> expression over the input line, the
    // reducer an aggregate over `value` — map.py:9-18 / reduce.py:2-17
    // as two CLI strings
    val in = Files.createTempDirectory("cli_expr_in")
    Files.writeString(in.resolve("a.txt"), "The quick brown fox\nthe lazy dog.\n")
    Files.writeString(in.resolve("b.txt"), "THE end\n")
    val out = Files.createTempDirectory("cli_expr_out").toString
    Main.main(Array(
      "--input", in.toString, "--output", out, "--r", "3",
      "--query", "expr",
      "--mapper-expr",
      "transform(filter(split(regexp_replace(lower(value), '[\\\\p{Punct}]', ' '), ' '), w -> w != ''), w -> struct(w AS key, 1L AS value))",
      "--reducer-expr", "sum(value)",
      "--key", "key", "--value", "value"))
    val files = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("out_"))
    assert(files.sorted.toSeq == Seq("out_0", "out_1", "out_2"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val counts = back.select($"key", $"value".cast("long"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("the" -> 3L, "quick" -> 1L, "brown" -> 1L, "fox" -> 1L,
      "lazy" -> 1L, "dog" -> 1L, "end" -> 1L))
  }

  test("CLI expr job without a reducer is map-only: raw kv pairs out") {
    val in = Files.createTempDirectory("cli_exprm_in")
    Files.writeString(in.resolve("a.txt"), "ab\ncd\n")
    val out = Files.createTempDirectory("cli_exprm_out").toString
    Main.main(Array(
      "--input", in.toString, "--output", out, "--r", "2",
      "--query", "expr",
      "--mapper-expr", "array(struct(value AS key, length(value) AS value))",
      "--key", "key", "--value", "value"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val rows = back.select($"key", $"value".cast("long")).as[(String, Long)].collect().toMap
    assert(rows == Map("ab" -> 2L, "cd" -> 2L))
  }

  test("CLI py job: the reference's two-.py submission runs unmodified via the pipe shim") {
    // the literal `w6/docs/design.md:66-74` contract: a mapper .py with
    // mapfunc(in_file) -> dict and a reducer .py with
    // reducefunc(in_file) -> dict, no engine code, no SQL
    val in = Files.createTempDirectory("cli_py_in")
    Files.writeString(in.resolve("a.txt"), "The quick brown fox\nthe lazy dog.\n")
    Files.writeString(in.resolve("b.txt"), "THE end\n")
    val (mapPy, redPy) = Queries.writeWordcountScripts()
    val out = Files.createTempDirectory("cli_py_out").toString
    Main.main(Array(
      "--input", in.toString, "--output", out, "--r", "3",
      "--query", "py",
      "--mapper-py", mapPy, "--reducer-py", redPy,
      "--key", "key", "--value", "value"))
    val files = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("out_"))
    assert(files.sorted.toSeq == Seq("out_0", "out_1", "out_2"))
    val back = io.KvText.read(spark, out)
    import spark.implicits._
    val counts = back.select($"key", $"value".cast("long"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("the" -> 3L, "quick" -> 1L, "brown" -> 1L, "fox" -> 1L,
      "lazy" -> 1L, "dog" -> 1L, "end" -> 1L))
  }

  test("PyJob keys may contain colons: last-colon split round-trips") {
    import spark.implicits._
    val d = Files.createTempDirectory("py_colon")
    // identity mapper emitting 'a:b' -> n keys: the wire format splits
    // on the LAST colon (reduce.py:9 rsplit), which PyJob must mirror
    Files.writeString(d.resolve("m.py"),
      """def mapfunc(p):
        |    out = {}
        |    with open(p) as f:
        |        for line in f:
        |            w = line.strip()
        |            if w:
        |                out[w + ":x"] = len(w)
        |    return out
        |""".stripMargin)
    val lines = Seq("ab", "cde").toDS()
    val rows = api.PyJob.run(lines, d.resolve("m.py").toString, None, 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("ab:x" -> "2", "cde:x" -> "3"))
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
