package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * Each operator from SURVEY.md §2 (plus the beyond-parity training-data
  * operators) is declared as a `QueryDef`: a Spark implementation over the
  * driver's parquet tables plus, when SQL-expressible, a DuckDB oracle query
  * that must hash-match it. Keeping the oracle adjacent to the implementation
  * keeps names/aliases in sync (the driver's compare sorts columns by name).
  *
  * Determinism rules every QueryDef follows:
  *   - no LIMIT without a total ORDER BY (ties broken by a key column);
  *   - doubles produced by arithmetic/aggregation are `round(_, n)`-ed on BOTH
  *     sides so parallel-vs-sequential summation order can't flip a hash;
  *   - timestamps are emitted as epoch seconds/micros (BIGINT) or formatted
  *     strings, never raw, so ns/µs precision mismatches can't occur.
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
