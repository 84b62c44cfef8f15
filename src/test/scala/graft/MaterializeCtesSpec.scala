package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `SparkEntry.materializeCtes`' tricky cases (r13 directive #5 +
  * ADVICE): the transform is a textual rewrite over ALL 355 oracles,
  * and it has already needed two semantic carve-outs — each pinned
  * here so the next DuckDB bump (or a new oracle shape) fails a unit
  * test instead of silently producing invalid SQL or, worse, a valid
  * query with different semantics (the WITH RECURSIVE case returned
  * 789 of 2897 rows, not an error).
  *
  * No SparkSession needed — the transform is a pure String function.
  */
class MaterializeCtesSpec extends AnyFunSuite {

  private def mat(sql: String): String = SparkEntry.materializeCtes(sql)

  test("a plain CTE is materialized") {
    assert(mat("WITH a AS (SELECT 1) SELECT * FROM a") ==
      "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
  }

  test("a doubly-referenced CTE gets exactly ONE MATERIALIZED") {
    val sql = "WITH heavy AS (SELECT x FROM t), b AS (SELECT * FROM heavy) " +
      "SELECT * FROM heavy JOIN b USING (x)"
    val out = mat(sql)
    assert("AS MATERIALIZED \\(".r.findAllIn(out).size == 2) // heavy + b
    assert(out.contains("heavy AS MATERIALIZED (SELECT x FROM t)"))
    assert(!out.contains("MATERIALIZED MATERIALIZED"))
  }

  test("a VALUES-table CTE with a column list stays untouched") {
    // `gk(gx, gy, g) AS (VALUES ...)` — the column list puts `)` before
    // AS, so the pattern must not fire on the NAME, and nothing inside
    // the VALUES body may be rewritten
    val sql = "WITH gk(gx, gy, g) AS (VALUES (1, 2, 0.5)), " +
      "s AS (SELECT * FROM gk) SELECT * FROM s"
    val out = mat(sql)
    assert(out.contains("gk(gx, gy, g) AS (VALUES (1, 2, 0.5))"))
    assert(out.contains("s AS MATERIALIZED (SELECT * FROM gk)"))
  }

  test("a single named-WINDOW clause stays untouched") {
    val sql = "WITH a AS (SELECT 1 AS x) SELECT sum(x) OVER w FROM a " +
      "WINDOW w AS (ORDER BY x)"
    val out = mat(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("WINDOW w AS (ORDER BY x)"))
  }

  test("EVERY definition of a multi-window clause stays untouched " +
      "(the second is preceded by `), ` exactly like a sibling CTE)") {
    val sql = "WITH a AS (SELECT 1 AS x) " +
      "SELECT sum(x) OVER w1, avg(x) OVER w2 FROM a " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY x ORDER BY x)"
    val out = mat(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("WINDOW w1 AS (ORDER BY x), " +
      "w2 AS (PARTITION BY x ORDER BY x)"))
  }

  test("a window spec containing parens (function call in ORDER BY) " +
      "is walked with balanced parens") {
    val sql = "SELECT sum(x) OVER w1, min(x) OVER w2 FROM t " +
      "WINDOW w1 AS (ORDER BY abs(x)), w2 AS (ORDER BY x), " +
      "post AS (ignored)"
    // `post AS (` follows the window list's final `)` + comma, so it IS
    // part of the window clause list per SQL grammar — stays untouched
    val out = mat(sql)
    assert(out == sql)
  }

  test("WITH RECURSIVE chains are exempt wholesale") {
    val sql = "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r " +
      "WHERE n < 5), heavy AS (SELECT * FROM r) SELECT * FROM heavy"
    assert(mat(sql) == sql)
  }

  test("the bare substring RECURSIVE does NOT exempt (a literal or " +
      "column name must not silently lose sibling materialization)") {
    val sql = "WITH a AS (SELECT 'RECURSIVE' AS tag) SELECT * FROM a"
    assert(mat(sql).contains("a AS MATERIALIZED (SELECT 'RECURSIVE' AS tag)"))
  }

  test("every registered oracle still parses under the transform " +
      "(structure smoke: balanced parens, no MATERIALIZED inside a " +
      "WINDOW clause)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val opens = sql.count(_ == '(')
      val closes = sql.count(_ == ')')
      assert(opens == closes, s"$name: unbalanced parens after transform")
      "\\bWINDOW\\s+\\w+\\s+AS\\s+MATERIALIZED".r.findFirstIn(sql).foreach {
        hit => fail(s"$name: window clause was materialized: $hit")
      }
    }
  }
}
