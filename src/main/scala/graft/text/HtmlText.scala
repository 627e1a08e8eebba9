package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the stage between "crawl dump" and
  * every text operator in this engine (t22 C4 cleaning, the l5 line
  * rules, quality/LM gates all assume EXTRACTED text; a real crawl
  * starts from HTML). Line-density boilerplate removal in the
  * jusText/trafilatura family (Pomikálek 2011, "Removing boilerplate
  * and duplicate content from web corpora"): a block is kept iff it
  * reads like prose — enough words, low LINK DENSITY (navigation/promo
  * blocks are mostly anchor text), and function-word evidence (human
  * sentences carry stopwords; "copyright … rights reserved" strings do
  * not). Reference anchor: the reference's value normalization is this
  * gesture at cell grain (`utils/read_data.py:18-50`, html-unescape +
  * whitespace collapse — implemented as S2); this is the document
  * grain.
  *
  * Everything is PURE COLUMNS over one materialized per-document block
  * array — no shuffle, no state, append-mode stream legal; the whole
  * extractor is a map-side pass whatever the corpus size. The block
  * array is materialized ONCE per row and the per-block lambdas
  * reference only their element (the w13 lesson: an HOF lambda that
  * references the outer split expression re-evaluates it per element —
  * O(len²) on long documents).
  */
object HtmlText {

  /** Function words a prose block of a real page carries; boilerplate
    * strings (nav labels, copyright lines) typically carry none. */
  val DefaultStops: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "with", "for")

  /** Drop script/style blocks (their content is never prose), break at
    * block-level tags, split into one array element per block. The
    * body match is lazy DOTALL (`.*?`) up to the first closing tag, so
    * script bodies containing '<' (`i < n`,
    * `document.write('<div>')`) are stripped too — the eager `[^<]*`
    * form left such blocks in place and their fragments carry JS
    * keywords that collide with the stopword list (`for`, `in`, `of`,
    * `is`, `it`, `a`, `with`), leaking code into extracted text. */
  def blocks(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val broken = regexp_replace(noScript,
      "(?i)</(?:p|div|h1|h2|h3|h4|li|tr|ul|ol|table|blockquote)>|<br */?>",
      "\n")
    split(broken, "\n")
  }

  /** The block's rendered text: tags stripped, whitespace collapsed.
    * The whitespace set is pinned to an explicit class — Java's `\s`
    * includes vertical tab U+000B while RE2's (the DuckDB mirror's)
    * does not, so a bare `\s+` would extract differently cross-engine
    * on a VT-bearing document. */
  def visible(line: Column): Column =
    trim(regexp_replace(regexp_replace(line, "<[^>]*>", " "),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Characters of anchor text in the block — the link-density
    * numerator. */
  def linkChars(line: Column): Column =
    aggregate(regexp_extract_all(line, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(x))

  /** Extract one document per row: (id, n_blocks, n_kept,
    * n_link_dropped, text) where `text` is the kept blocks re-joined
    * with newlines in page order. Keep rule per non-blank block:
    * word count ≥ `minWords` AND link density ≤ 1/4 (integer
    * cross-multiplied: 4·linkChars ≤ len(visible)) AND (carries a
    * stopword OR word count ≥ `longWords`). `n_link_dropped` counts
    * blocks dropped SOLELY by the link-density rule — the
    * crawl-quality telemetry a pipeline dashboards. */
  def extract(df: DataFrame, htmlCol: String, idCol: String,
      minWords: Int = 5, longWords: Int = 15,
      stops: Seq[String] = DefaultStops): DataFrame = {
    val lineStats = transform(col("__blk"), l => {
      val v = visible(l)
      val words = filter(split(lower(v), "[^a-z0-9]+"), w => w =!= "")
      struct(v.as("v"), linkChars(l).as("lc"),
        size(words).as("wc"),
        arrays_overlap(words, typedlit(stops)).as("stop"))
    })
    def prose(e: Column): Column =
      e("v") =!= "" && e("wc") >= minWords &&
        (e("stop") || e("wc") >= longWords)
    df.withColumn("__blk", blocks(col(s"`$htmlCol`")))
      .withColumn("__ln", lineStats)
      .select(col(s"`$idCol`").as("id"),
        size(filter(col("__ln"), e => e("v") =!= "")).as("n_blocks"),
        size(filter(col("__ln"), e =>
          prose(e) && e("lc") * 4 <= length(e("v")))).as("n_kept"),
        size(filter(col("__ln"), e =>
          prose(e) && e("lc") * 4 > length(e("v")))).as("n_link_dropped"),
        array_join(transform(filter(col("__ln"), e =>
          prose(e) && e("lc") * 4 <= length(e("v"))), e => e("v")), "\n")
          .as("text"))
  }
}
