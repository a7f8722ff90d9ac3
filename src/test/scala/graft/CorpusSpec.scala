package graft

import graft.queries.Corpus

/** Smoke-level gate for the correctness corpus: every declared query runs
  * on sf0.001 and yields rows; deeper value-level checks run through the
  * DuckDB oracle (tools/oracle_check.py, mirrored by the driver).
  */
class CorpusSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and every oracle points at a query") {
    val names = Corpus.defs.map(_.name)
    assert(names.distinct.sizeIs == names.size)
    assert(Corpus.oracleSql.keySet.subsetOf(Corpus.queries.keySet))
  }

  Corpus.defs.foreach { q =>
    test(s"${q.name} runs, returns rows, and emits no -0.0 on sf0.001") {
      val df = q.run(spark, sfDir)
      // one-pass count + signed-zero audit: -0.0 is float-equal to +0.0
      // but hash-distinct in the driver's compare (the d16 escape class);
      // this keeps that class dead as the corpus grows
      val (n, negZero) = Verify.countAndNegZero(df)
      assert(n > 0, s"${q.name} returned no rows")
      assert(negZero == 0L,
        s"${q.name} emits $negZero IEEE -0.0 double(s) — normalize with " +
          "`+ lit(0.0)` after the round/diff")
    }
  }
}
