package graft.functions

import scala.collection.immutable.TreeMap

/** The report-shaping serializers (SURVEY §2.2).
  *
  * `PairTree` models the reference's pair-EDN report payload: a nested
  * tree of `[k v]` pairs where a leaf level of scalar pairs renders as
  * `"k=v"` strings inside a JSON array, and branch pairs render as JSON
  * object fields (reference src/common/trgx.clj:78-79 `pair-edn->json`,
  * built by `tr-dimension-metrics` trgx.clj:72-77).
  *
  * Key order is canonicalized to sorted-ascending in UTF-8 byte order
  * ([[Utf8Order]] — NOT Java's UTF-16 code-unit order, which diverges
  * on supplementary-plane keys while the DuckDB oracle collates bytes)
  * so the emitted JSON is deterministic across partitions/engines
  * (SURVEY §7 "What's hard").
  */
object JsonShape {

  private implicit val keyOrd: Ordering[String] = Utf8Order.ordering

  sealed trait PairTree
  /** Branch: dimension value → subtree. */
  final case class Branch(children: TreeMap[String, PairTree]) extends PairTree
  /** Leaf: metric name → already-formatted metric value. */
  final case class Leaf(metrics: TreeMap[String, String]) extends PairTree

  object Branch {
    def apply(kvs: (String, PairTree)*): Branch = Branch(TreeMap(kvs: _*))
  }
  object Leaf {
    def apply(kvs: (String, String)*): Leaf = Leaf(TreeMap(kvs: _*))
  }

  /** JSON string escape — Jackson-compatible, BYTE-IDENTICAL to the
    * trgx tree renderer's escape table (short escapes incl. \b/\f,
    * uppercase \u00XX for the rest): one canonical form across both
    * JSON surfaces, so a key renders the same bytes whichever renderer
    * emits it (PropertiesSpec pins parity against Jackson itself). */
  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\b'          => sb.append("\\b")
      case '\f'          => sb.append("\\f")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04X")
      case c             => sb.append(c)
    }
    sb.toString
  }

  // RFC 8259 number grammar incl. the exponent part: a leading-zero
  // string like "007" must stay QUOTED (emitting it bare is invalid
  // JSON), but "1.0E-5" — what a Spark double CASTs to — is a valid
  // JSON number and must emit bare, matching cheshire printing an EDN
  // double
  private val NumericRe =
    "^-?(0|[1-9]\\d*)(\\.\\d+)?([eE][+-]?\\d+)?$".r

  /** Render a scalar as JSON: numeric strings stay numbers (the
    * reference's metric values are EDN numbers → unquoted in cheshire's
    * output), everything else is a quoted string; null renders as JSON
    * null. */
  def jsonScalar(v: String): String =
    if (v == null) "null"
    else if (NumericRe.matches(v)) v
    else "\"" + esc(v) + "\""

  /** `pair-edn->json` on the dimension-metrics tree (trgx.clj:78-79):
    * branch keys are already `header=value` strings (built by
    * tr-dimension-metrics' dimension pairs); metric leaves stay plain
    * JSON object fields — in the reference only non-map-entry `[k v]`
    * pairs collapse to `"k=v"`, and metric entries are map entries. */
  def pairTreeToJson(t: PairTree): String = t match {
    case Leaf(ms) =>
      ms.map { case (k, v) => "\"" + esc(k) + "\":" + jsonScalar(v) }
        .mkString("{", ",", "}")
    case Branch(ch) =>
      ch.map { case (k, v) => "\"" + esc(k) + "\":" + pairTreeToJson(v) }
        .mkString("{", ",", "}")
  }

  /** `pair-edn->json` on a `vars->pair` selector list: ordered `[k v]`
    * pairs → JSON array of `"k=v"` strings (the collapse case;
    * m_cocacola_score_overall.clj:72-74). */
  def kvPairsToJson(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => "\"" + esc(s"$k=$v") + "\"" }
      .mkString("[", ",", "]")

  /** Build a PairTree from rows of (dimension-path, metrics). Last
    * write wins per identical path, matching Clojure `assoc-in` merge
    * order. MIXED GRAIN — one path a proper prefix of another in the
    * same group — is refused loudly: the ADT has no node that is both
    * a metrics leaf and a branch, so the silent alternative would drop
    * whichever side inserted first with the survivor depending on
    * iteration order. */
  def fromRows(rows: Iterable[(Seq[String], Seq[(String, String)])]): PairTree = {
    if (rows.isEmpty) return Branch()
    def insert(t: PairTree, path: Seq[String],
               metrics: Seq[(String, String)]): PairTree =
      path match {
        case Nil => t match {
          case b: Branch if b.children.nonEmpty =>
            throw new IllegalArgumentException(
              "tr-dimension-metrics: dimension path is a proper prefix " +
                s"of another path in the same group (children: " +
                s"${b.children.keys.mkString(", ")}) — mixed grain " +
                "cannot render as one pair-tree")
          case _ => Leaf(TreeMap(metrics: _*))
        }
        case h +: rest =>
          val br = t match {
            case b: Branch => b
            // ANY Leaf refuses, even metric-less (an all-null metrics
            // map aggregates to an empty Leaf): silently widening an
            // empty Leaf to a Branch made mixed grain insertion-order
            // dependent — one order rendered, the other threw, and the
            // aggregate feeds this from hash-map iteration order
            case _: Leaf =>
              throw new IllegalArgumentException(
                "tr-dimension-metrics: dimension path extends another " +
                  s"path in the same group that is already a leaf " +
                  s"(at segment '$h') — mixed grain cannot render as " +
                  "one pair-tree")
          }
          val child = br.children.getOrElse(h, Branch(TreeMap.empty[String, PairTree]))
          Branch(br.children.updated(h, insert(child, rest, metrics)))
      }
    rows.foldLeft[PairTree](Branch()) { case (acc, (p, m)) => insert(acc, p, m) }
  }

  /** `get-item-json-string`: flat JSON object from named fields
    * (m_cocacola_gt_score_deep_dive.clj:36-37), canonical key order. */
  def flatJson(fields: (String, String)*): String =
    TreeMap(fields: _*)
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
}
