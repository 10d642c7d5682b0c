package graft.detect

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Span

/** Differential parity against goldens produced by RUNNING the reference
  * implementation (propose_candidates / redact_text / contexts_for_candidates
  * from /root/reference) over a 219-text fuzz corpus: every span offset,
  * label, confidence, validation flag, redacted text, and ±48 context window
  * must match byte-for-byte. This pins the Java-vs-Python regex dialect
  * subtleties called out in SURVEY §7.4 #2 (word boundaries, IGNORECASE PAN,
  * Unicode masking). */
class GoldenParitySpec extends AnyFunSuite {

  // minimal JSONL reader for the golden schema (no JSON dep in test scope)
  private def rows: Seq[ujsonLite.Obj] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_reference.jsonl"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(ujsonLite.parseObj).toVector
    finally src.close()
  }

  test("candidates, redaction, and contexts match the reference byte-for-byte") {
    val all = rows
    assert(all.size == 219)
    var nCands = 0
    for (r <- all) {
      val text = r.str("text")
      val got = Rules.proposeCandidates(text)
      val exp = r.arr("candidates")
      assert(got.size == exp.size, s"candidate count for: $text — got ${got.map(c => (c.start, c.end, c.ruleLabel))}")
      for ((g, e) <- got.zip(exp)) {
        assert(g.start == e.num("start").toInt, s"start in: $text")
        assert(g.end == e.num("end").toInt, s"end in: $text")
        assert(g.value == e.str("value"), s"value in: $text")
        assert(g.ruleLabel == e.str("label"), s"label in: $text")
        assert(math.abs(g.ruleConfidence - e.num("conf")) < 1e-12, s"conf in: $text")
        assert(g.validations == e.obj("valid").boolMap, s"validations in: $text")
        nCands += 1
      }
      val spans = got.map(c => Span(c.start, c.end, c.value))
      assert(Redaction.redactText(text, spans) == r.str("redacted"), s"redacted for: $text")
      val ctxs = Redaction.contexts(text, spans, 48)
      assert(ctxs == r.arr("contexts").map(_.asString), s"contexts for: $text")
    }
    assert(nCands == 513)
  }
}

/** Tiny JSON reader sufficient for the golden file (flat strings/numbers/
  * bools, one level of array-of-object + string arrays). */
private object ujsonLite {
  sealed trait V { def asString: String = this.asInstanceOf[S].v }
  case class S(v: String) extends V
  case class N(v: Double) extends V
  case class B(v: Boolean) extends V
  case class A(v: Vector[V]) extends V
  case class Obj(v: Map[String, V]) extends V {
    def str(k: String): String = v(k).asInstanceOf[S].v
    def num(k: String): Double = v(k).asInstanceOf[N].v
    def arr(k: String): Vector[Obj2] = v(k).asInstanceOf[A].v.map(Obj2)
    def obj(k: String): Obj = v(k).asInstanceOf[Obj]
    def boolMap: Map[String, Boolean] = v.map { case (k2, B(b)) => k2 -> b case (k2, x) => k2 -> (x == B(true)) }
  }
  case class Obj2(u: V) {
    private def o = u.asInstanceOf[Obj]
    def str(k: String): String = o.str(k)
    def num(k: String): Double = o.num(k)
    def obj(k: String): Obj = o.obj(k)
    def asString: String = u.asInstanceOf[S].v
  }
  implicit def obj2v(o: Obj2): V = o.u

  def parseObj(line: String): Obj = new P(line).parseValue().asInstanceOf[Obj]

  private class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseValue(): V = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, V]
          if (s.charAt(i) == '}') { i += 1; return Obj(m.result()) }
          while (true) {
            ws(); val k = parseString(); ws(); require(s.charAt(i) == ':'); i += 1
            m += k -> parseValue(); ws()
            if (s.charAt(i) == ',') i += 1
            else { require(s.charAt(i) == '}'); i += 1; return Obj(m.result()) }
          }
          Obj(m.result())
        case '[' =>
          i += 1; ws()
          val b = Vector.newBuilder[V]
          if (s.charAt(i) == ']') { i += 1; return A(b.result()) }
          while (true) {
            b += parseValue(); ws()
            if (s.charAt(i) == ',') i += 1
            else { require(s.charAt(i) == ']'); i += 1; return A(b.result()) }
          }
          A(b.result())
        case '"' => S(parseString())
        case 't' => i += 4; B(true)
        case 'f' => i += 5; B(false)
        case 'n' => i += 4; S(null)
        case _ =>
          val j = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          N(s.substring(j, i).toDouble)
      }
    }
    private def parseString(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case other => sb += other
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString
    }
  }
}
