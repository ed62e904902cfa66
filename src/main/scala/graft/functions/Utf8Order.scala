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
    override def compare(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }
}
