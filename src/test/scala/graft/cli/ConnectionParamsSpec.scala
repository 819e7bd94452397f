package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Connection-flag parsing (reference main.py:16-26 parity for R12). */
class ConnectionParamsSpec extends AnyFunSuite {

  private val base = ConnectionParams("localhost", 5439, "graft", None, None)

  test("defaults mirror the reference: localhost:5439, no db") {
    assert(base.jdbcUrl == "jdbc:postgresql://localhost:5439/")
    assert(base.jdbcOptions == Map("user" -> "graft"))
  }

  test("all five flags parse in any order, before the subcommand") {
    val args = List("--db", "analytics", "--host", "rs.example", "--user", "alice",
      "--port", "5555", "--password", "s3cret", "transform", "src", "base", "s", "t")
    val Right((c, rest)) = ConnectionParams.parse(args, base)
    assert(c == ConnectionParams("rs.example", 5555, "alice", Some("s3cret"), Some("analytics")))
    assert(c.jdbcUrl == "jdbc:postgresql://rs.example:5555/analytics")
    assert(c.jdbcOptions == Map("user" -> "alice", "password" -> "s3cret"))
    assert(rest == List("transform", "src", "base", "s", "t"))
  }

  test("a full jdbc: URL in --db wins verbatim") {
    val Right((c, _)) = ConnectionParams.parse(List("--db", "jdbc:derby:/tmp/x;create=true", "export"), base)
    assert(c.jdbcUrl == "jdbc:derby:/tmp/x;create=true")
  }

  test("malformed flags are rejected with a message") {
    assert(ConnectionParams.parse(List("--port", "not_a_number", "export"), base).isLeft)
    assert(ConnectionParams.parse(List("--bogus", "v", "export"), base).isLeft)
    assert(ConnectionParams.parse(List("--host"), base).isLeft) // missing value
    // an unknown flag in FINAL position is "unknown", not "missing value" —
    // only KNOWN value-taking flags can be missing a value
    assert(ConnectionParams.parse(List("--bogus"), base)
      .swap.exists(_.contains("unknown option")))
    assert(ConnectionParams.parse(List("--host"), base)
      .swap.exists(_.contains("missing its value")))
  }

  test("no flags passes args through untouched") {
    val Right((c, rest)) = ConnectionParams.parse(List("add_part", "b", "s", "t", "k", "v"), base)
    assert(c == base)
    assert(rest == List("add_part", "b", "s", "t", "k", "v"))
  }
}
