package graft.detect

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.PiiTypes

/** Candidate feature vector (rules.py:169-180): surface features + per-type
  * validation/rule one-hots, as pure column expressions (C19). Feeds the
  * embedding classifier's feature space and debugging output. */
object Features {

  /** struct(len, has_at, has_dot, has_digits, digits_ratio, rule_conf,
    * val_<type>..., rule_is_<type>...) for one exploded candidate. */
  def featureVector(value: Column, ruleLabel: Column, ruleConf: Column,
                    validations: Column): Column = {
    val nDigits = length(regexp_replace(value, "[^0-9]", ""))
    val base = Seq(
      length(value).as("len"),
      value.contains("@").as("has_at"),
      value.contains(".").as("has_dot"),
      (nDigits > 0).as("has_digits"),
      (nDigits.cast("double") / greatest(length(value), lit(1))).as("digits_ratio"),
      ruleConf.as("rule_conf"))
    val oneHots = PiiTypes.ALL.flatMap { t =>
      Seq(
        coalesce(element_at(validations, t), lit(false)).as(s"val_$t"),
        when(ruleLabel === t, 1).otherwise(0).as(s"rule_is_$t"))
    }
    struct(base ++ oneHots: _*)
  }
}

/** Log scrubbing (logging_utils.py:149-186, C27): every span text replaced by
  * its shape-preserving mask across a payload, spans deduped by text. A
  * driver-side utility — logging is not data-plane. */
object LogScrubber {
  def scrub(payload: String, spanTexts: Seq[String]): String =
    spanTexts.distinct.filter(_.nonEmpty).foldLeft(payload) { (acc, t) =>
      acc.replace(t, Redaction.maskToken(t))
    }

  /** Scrub nested string/seq/map payloads like the reference's recursive
    * walker (logging_utils.py:160-178). */
  def scrubAny(payload: Any, spanTexts: Seq[String]): Any = payload match {
    case s: String => scrub(s, spanTexts)
    case xs: Seq[_] => xs.map(scrubAny(_, spanTexts))
    case m: Map[_, _] => m.map { case (k, v) => k -> scrubAny(v, spanTexts) }
    case other => other
  }
}
