package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Total order on Strings by UTF-8 byte sequence (unsigned) —
  * equivalently Unicode code-point order.
  *
  * `java.lang.String`'s natural order compares UTF-16 code units, which
  * diverges for supplementary-plane characters: their surrogate pairs
  * (0xD800–0xDFFF units) sort BELOW U+E000..U+FFFF in UTF-16 but their
  * UTF-8 bytes sort ABOVE. The DuckDB oracle (and every sane
  * engine-portable contract) collates UTF-8 bytes, so ALL observable
  * key orderings in this library — report JSON canonicalization, trgx
  * tree serialization, native-aggregate map keys — must sort with this
  * ordering, never with `Ordering.String`. [[graft.agg]]'s native
  * aggregates already do (they sort `UTF8String` directly); this object
  * is the same comparison for driver/executor Scala collections. */
object Utf8Order {
  val ordering: Ordering[String] = new Ordering[String] {
    // code-point comparison directly on the UTF-16 chars — identical
    // order to UTF-8 byte comparison (byte order = code-point order)
    // without allocating and re-encoding two UTF8Strings per compare
    // (this ordering backs every TreeMap in the report/trgx renderers,
    // so it runs O(log n) times per key insert per group).
    // Fast path: chars below the surrogate range compare identically
    // as code units; only when BOTH sides are at/above 0xD800 do
    // surrogate semantics matter.
    override def compare(a: String, b: String): Int = {
      val la = a.length; val lb = b.length
      var i = 0
      while (i < la && i < lb) {
        val ca = a.charAt(i); val cb = b.charAt(i)
        if (ca != cb) {
          if (ca < 0xD800 && cb < 0xD800) return ca - cb
          val cpa = a.codePointAt(i); val cpb = b.codePointAt(i)
          if (cpa != cpb) return Integer.compare(cpa, cpb)
          // equal code points with different chars cannot happen
          return ca - cb
        }
        i += 1
      }
      la - lb
    }
  }
}
