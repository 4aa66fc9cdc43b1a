package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers shared by the LLM-pipeline operators, with Spark + DuckDB
  * (oracle) twins kept in lock-step.
  *
  * The portable hash: both engines agree on `md5` of a UTF-8 string, so
  * `long(md5[0:15])` (60 bits, sign-safe) is a deterministic hash
  * computable identically in Spark (`conv(...,16,10)`) and DuckDB
  * (`CAST('0x'||... AS BIGINT)`). Spark's native `hash`/`xxhash64` have
  * no DuckDB counterpart, so oracle-checked operators use this instead;
  * at 100 TB you'd swap in `xxhash64` (same plan shape, cheaper hash).
  */
object Portable {

  /** 60-bit deterministic hash of a string column (Spark side): the
    * fused [[graft.functions.Md5Long]] expression (register the session
    * via `graft.functions.GraftFunctions.register` before analysis).
    */
  def md5Long(c: Column): Column =
    call_function("md5_long", c)

  /** DuckDB twin of [[md5Long]] — `x` is a SQL expression string. */
  def md5LongSql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Bounded global window anchor (round 14, VERDICT r13 item 5 /
    * "Next round" item 8): a CONSTANT-VALUED, non-foldable partition
    * key for window functions whose input is provably METADATA-scale
    * (size fixed by named constants or group cardinality, never the
    * corpus — each call site documents its bound). Semantics are
    * identical to an unpartitioned window: `pmod(hash(x), 1) = 0` for
    * every row, so all rows share one partition and ordering/framing
    * see the full frame. The point is the non-empty partition spec —
    * WindowExec logs its corpus-scale "No Partition Defined" warning
    * whenever the spec is empty, and these windows' single-partition
    * execution is the DESIGN, so the warning was pure noise drowning
    * real ones. Spelled with hash() rather than lit(0) because Spark
    * 4's EliminateWindowPartitions optimizer rule strips FOLDABLE
    * partition keys, which would resurrect the warning.
    */
  def boundedW(anchor: Column): org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.partitionBy(pmod(hash(anchor), lit(1)))

  /** Normalized word array: lowercase, split on whitespace. */
  def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  def wordsSql(x: String): String =
    s"string_split_regex(lower(trim($x)), '\\s+')"

  /** Whitespace word count — t2/t3's `n_words`/`ws_tokens`. */
  def nWords(c: Column): Column = size(words(c))

  /** BPE-ish token count (letter runs | digit runs | single symbols) —
    * t3's `bpe_tokens`, reused by p1 and the streaming ingest.
    */
  def bpeTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Whitespace-normalized text (lowercase, trimmed, runs collapsed). */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** DuckDB twin of [[normText]] — ONE spelling for every oracle site
    * (t4, p1, d1's normSql, qc9): an edit lands everywhere at once, so
    * the canary always probes what the operators actually run.
    */
  def normTextSql(x: String): String =
    s"regexp_replace(lower(trim($x)), '\\s+', ' ', 'g')"

  /** DuckDB twin of [[normFingerprint]]. */
  def normFingerprintSql(x: String): String =
    s"md5(${normTextSql(x)})"

  /** ASCII projection — drops every codepoint outside printable ASCII
    * (`[ -~]` = 0x20..0x7E). The UNIT-ALIGNMENT shim for cross-engine
    * edit distance: DuckDB's `levenshtein` counts BYTES while Spark's
    * counts CODEPOINTS, and the two coincide exactly on ASCII — so d16
    * (and its qc10 canary) measure over this projection, where
    * byte = codepoint = character by construction and `len()` agrees
    * with the distance's units inside DuckDB too. Identity on the
    * all-ASCII testdata corpora.
    */
  def asciiText(c: Column): Column = regexp_replace(c, "[^ -~]", "")

  /** DuckDB twin of [[asciiText]] — same pattern, 'g' flag. */
  def asciiTextSql(x: String): String =
    s"regexp_replace($x, '[^ -~]', '', 'g')"

  /** md5 hex fingerprint of whitespace-normalized text — the ONE
    * normalization d1, t4, p1 and the streaming ingest dedup share (the
    * streaming/batch dedup contract rests on these being identical).
    */
  def normFingerprint(c: Column): Column = md5(normText(c))

  /** Word bigram array (space-joined), empty when fewer than 2 words —
    * pure column algebra (two slices zipped), so bigram generation needs
    * no window shuffle and stays inside WholeStageCodegen.
    */
  def bigrams(wordsCol: Column): Column =
    when(size(wordsCol) >= 2,
      zip_with(
        slice(wordsCol, lit(1), size(wordsCol) - 1),
        slice(wordsCol, lit(2), size(wordsCol) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))

  /** Word k-gram spans (space-joined), empty when fewer than k words —
    * the sliding window under both the 3-gram shingles (d2/d3) and the
    * d8 span-position table. Pure column algebra (sequence + slice), so
    * span generation stays inside WholeStageCodegen.
    */
  def spansK(wordsCol: Column, k: Int): Column =
    when(size(wordsCol) >= k,
      transform(sequence(lit(1), size(wordsCol) - (k - 1)), // 1-based window starts
        i => concat_ws(" ", slice(wordsCol, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[spansK]], as a SQL snippet producing a list of
    * 'w1 .. wk' strings from a words-list expression `w`.
    */
  def spansKSql(w: String, k: Int): String =
    s"""CASE WHEN len($w) >= $k
        THEN list_transform(generate_series(1, len($w) - ${k - 1}),
                            i -> array_to_string(list_slice($w, i, i + ${k - 1}), ' '))
        ELSE [] END"""

  /** Word 3-gram shingles (space-joined), empty when fewer than 3 words. */
  def shingles3(wordsCol: Column): Column = spansK(wordsCol, 3)

  /** DuckDB twin of shingle generation, as a SQL snippet producing a list
    * of 'w1 w2 w3' strings from a words-list expression `w`.
    */
  def shingles3Sql(w: String): String = spansKSql(w, 3)
}
