package graft.queries

import org.apache.spark.sql.DataFrame

/** Engine-computed ORACLE FIXTURES — the seam that shrinks the
  * no-oracle set to the true engine-only kernels.
  *
  * Some kernels (DEFLATE sizes, container decodes) have no DuckDB
  * counterpart, so queries built on them historically had no oracle at
  * all — even though everything DOWNSTREAM of the kernel (binning,
  * ratio math, banding, Hamming re-checks, rollups) is ordinary
  * relational work DuckDB can recompute exactly. The fixture mechanism
  * splits the query at that seam: the engine materializes the kernel's
  * per-row outputs as a parquet table under a deterministic path, the
  * query's RESULT is then derived from the read-back fixture, and the
  * oracle SQL recomputes the same downstream over
  * `read_parquet('<fixture>')`. The kernel itself stays gated by its
  * spec (interpreted-vs-codegen equality, container-bypass recomputes);
  * the oracle now hash-gates every relational step after it.
  *
  * Paths are keyed by the SF directory's basename so interleaved
  * verify runs at different scales never read each other's fixtures;
  * oracle SQL embeds the [[SfToken]] placeholder, which
  * [[graft.Verify]] substitutes with the run's actual tag when dumping
  * `oracle_sql.json`. The root lives under the build's `target/`
  * directory: stable, absolute, writable, and never committed.
  *
  * Scale note: a fixture write is one extra narrow-column parquet dump
  * per query run — kernel outputs only (ids + longs), never text or
  * payload bytes — and it is VERIFICATION plumbing: the registered
  * `queries()` entries pay it so every run stays oracle-able (and the
  * bench baseline prices it honestly), while a production caller that
  * doesn't want the dump composes the same library operators directly
  * (the kernel expressions and the downstream relational steps are
  * ordinary public columns/frames).
  */
object OracleFixtures {

  /** Placeholder the oracle SQL uses where the per-run SF tag goes. */
  val SfToken = "__SF__"

  /** Fixture root: overridable via `-Dgraft.fixtures.dir` or
    * `GRAFT_FIXTURES_DIR`, defaulting to the build's `target/` relative
    * to the launch directory — absolutized HERE so the path embedded in
    * `oracle_sql.json` stays valid for a DuckDB process with a
    * different working directory. Single-JVM concurrency note: like
    * `servedIndexWith`'s side tables, fixture writes assume one verify
    * run per (query, SF) at a time — two concurrent runs of the SAME
    * query at the SAME SF may overwrite each other's fixture
    * mid-read (different SFs never collide: the path is SF-keyed). */
  private val Root: String = new java.io.File(
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse("target/oracle_fixtures")).getAbsolutePath

  private def tag(dir: String): String = new java.io.File(dir).getName

  /** Deterministic fixture path for (sf dir, fixture name). */
  def path(dir: String, name: String): String = s"$Root/${tag(dir)}/$name"

  /** The DuckDB-side reference to the same fixture, with the SF tag
    * still tokenized (substituted at dump time by [[graft.Verify]]). */
  def sqlRef(name: String): String =
    s"read_parquet('$Root/$SfToken/$name/*.parquet')"

  /** Resolve [[SfToken]] in an oracle SQL string for a concrete run. */
  def substitute(sql: String, dir: String): String =
    sql.replace(SfToken, tag(dir))

  /** Materialize `df` as the fixture `name` and return the READ-BACK
    * frame — the query's downstream must build on the read-back, not
    * the original, so the Spark result and the DuckDB oracle consume
    * byte-identical kernel outputs. */
  def materialize(df: DataFrame, dir: String, name: String): DataFrame = {
    val p = path(dir, name)
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }
}
