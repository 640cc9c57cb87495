package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Balanced-element isolation for the TEI ingest: one linear scan per
  * document that slices EVERY `<tag …>…</tag>` element — nested
  * occurrences included, in document (open-tag) order — exactly the
  * element set lxml's `//tei:item` traversal visits in the reference's
  * nametable builder (script/utils/nametable.py:47). A regex isolator
  * cannot do this: `<item.*?</item>` closes the outer item at the
  * FIRST inner close tag, mis-slicing any legal nested list.
  *
  * The scan tracks open-tag depth with a position stack, honors
  * self-closing tags, skips comments/CDATA, and ignores `>` inside
  * quoted attribute values. Output is a struct so the isolator and its
  * audit share one tokenization:
  *   slices  — matched element substrings, document-ordered
  *   n_open  — open events (self-closing tags count as open+close)
  *   n_close — close events (stray closes still count)
  * A well-formed file has n_open = n_close = size(slices); unclosed
  * opens and stray closes each break one equality, so corruption stays
  * detectable per file. Runs once per whole-text file row, codegen'd,
  * O(bytes) — ingest throughput scales with file count.
  */
case class XmlElementScan(child: Expression, tag: String) extends UnaryExpression {
  override def dataType: DataType = XmlElementScan.outType
  override def prettyName: String = "xml_element_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(xml: Any): Any =
    XmlElementScan.compute(xml.asInstanceOf[UTF8String], tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tag", tag, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.XmlElementScan.compute($c, $tagRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): XmlElementScan =
    copy(child = newChild)
}

object XmlElementScan {
  val outType: StructType = StructType(Seq(
    StructField("slices", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n_open", IntegerType, nullable = false),
    StructField("n_close", IntegerType, nullable = false)))

  def compute(xmlU: UTF8String, tag: String): InternalRow = {
    val xml = xmlU.toString
    val n = xml.length
    val tlen = tag.length
    // (start, end) of matched elements; document order restored by a
    // sort on start (the stack pops inner elements first)
    val matched = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
    var nOpen = 0
    var nClose = 0
    var i = 0
    while (i < n) {
      if (xml.charAt(i) == '<') {
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("</", i) && xml.startsWith(tag, i + 2) &&
            { var j = i + 2 + tlen; while (j < n && Character.isWhitespace(xml.charAt(j))) j += 1
              j < n && xml.charAt(j) == '>' }) {
          var j = i + 2 + tlen
          while (j < n && Character.isWhitespace(xml.charAt(j))) j += 1
          nClose += 1
          if (stack.nonEmpty) {
            val start = stack.remove(stack.length - 1)
            matched += ((start, j + 1))
          }
          i = j + 1
        } else if (xml.startsWith(tag, i + 1) && i + 1 + tlen < n &&
            { val c = xml.charAt(i + 1 + tlen)
              Character.isWhitespace(c) || c == '>' || c == '/' }) {
          // scan to the real tag end: a '>' inside a quoted attribute
          // value does not close the tag
          var j = i + 1 + tlen
          var quote: Char = 0
          var lastNonWs: Char = 0
          while (j < n && (quote != 0 || xml.charAt(j) != '>')) {
            val c = xml.charAt(j)
            if (quote != 0) { if (c == quote) quote = 0 }
            else if (c == '"' || c == '\'') quote = c
            if (!Character.isWhitespace(c)) lastNonWs = c
            j += 1
          }
          nOpen += 1
          if (j < n && lastNonWs == '/') { // self-closing: <tag …/>
            nClose += 1
            matched += ((i, j + 1))
          } else if (j < n) {
            stack += i
          } // unclosed at EOF: counted open, never matched
          i = if (j < n) j + 1 else n
        } else i += 1
      } else i += 1
    }
    val ordered = matched.sortBy(_._1)
    val slices = new GenericArrayData(
      ordered.map(se => UTF8String.fromString(xml.substring(se._1, se._2))).toArray[Any])
    InternalRow(slices, nOpen, nClose)
  }
}
