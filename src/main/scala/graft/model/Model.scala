package graft.model

/** Control-plane case classes (SURVEY.md §1.1). These are deliberately
  * small: profiles/rules/clusters have cardinality O(#columns), never
  * O(#rows), so they broadcast freely on a large cluster.
  */

/** Per-(table, column) statistical profile — the ~35-feature analogue of
  * the reference's column profiler (reference: profiling/profiler.py:169-357),
  * computed distributively in two passes (one wide agg + one long-format
  * frequency agg).
  */
case class ColumnProfile(
    table: String,
    column: String,
    row_count: Long,
    null_count: Long,
    null_ratio: Double,
    distinct_count: Long,
    unique_ratio: Double,
    // character-level census (reference: profiling/profiler.py:199-210)
    alpha_chars: Long,
    digit_chars: Long,
    punct_chars: Long,
    space_chars: Long,
    misc_chars: Long,
    // word-level (reference: profiling/profiler.py:212-227)
    word_count: Long,
    alpha_words: Long,
    digit_words: Long,
    punct_words: Long,
    misc_words: Long,
    avg_word_len: Double,
    // whole-cell classes (reference: profiling/profiler.py:229-242)
    numeric_cells: Long,
    alpha_cells: Long,
    empty_cells: Long,
    other_cells: Long,
    // string lengths (reference: profiling/profiler.py:292-295)
    min_len: Long,
    max_len: Long,
    avg_len: Double,
    // numeric stats on parseable values (reference: profiling/profiler.py:248-274)
    num_count: Long,
    num_min: Double,
    num_max: Double,
    num_mean: Double,
    num_q1: Double,
    num_median: Double,
    num_q3: Double,
    max_digits: Int,
    max_decimals: Int,
    // type vote ratios (reference: profiling/profiler.py:74-127)
    ratio_int: Double,
    ratio_float: Double,
    ratio_bool: Double,
    ratio_date: Double,
    inferred_type: String,
    // frequency-pass features (reference: profiling/profiler.py:271-299)
    dominant_pattern: String,
    dominant_pattern_ratio: Double,
    mode_value: String,
    mode_ratio: Double,
    first_digit_mode: Int,
    distinct_chars: Long,
    top_keywords: Seq[String])

/** Table-level rollup: mean/variance of selected column features
  * (reference: profiling/profiler.py:581-630). */
case class DatasetProfile(
    table: String,
    n_columns: Long,
    n_rows: Long,
    avg_null_ratio: Double,
    var_null_ratio: Double,
    avg_unique_ratio: Double,
    var_unique_ratio: Double,
    avg_len_mean: Double,
    numeric_column_ratio: Double,
    string_column_ratio: Double)

/** A cell-level violation emitted by the rule engine
  * (reference: rules/evaluation.py:648-654). */
case class Violation(
    table: String,
    column: String,
    row_id: Long,
    value: String,
    rule: String,
    severity: String)

/** Cluster assignment of a column (reference: utils/clustering.py:60-66). */
case class ClusterAssignment(cluster_id: Int, table: String, column: String)
