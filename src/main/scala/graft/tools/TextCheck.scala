package graft.tools

import graft.text._

/** Dev scratch main: dumps pipeline output for the reference golden cases
  * so icu4j/Porter2 behavior can be eyeballed before the ScalaTest suite
  * pins it. Not part of the library surface. */
object TextCheck {
  def main(args: Array[String]): Unit = {
    val normOnly = PipelineConfig(filters = Seq("normalizer"))
    val tok = Seq(
      "a",
      "The quick brown fox jumped over the lazy dog.",
      "We will play with I.B.M.",
      "Hello_I_m_arbitrary_concatenated, foo and bar",
      "the [client] is <foo>, some *bold* marks.",
      "Text,which doesn't  have spaces right;one;two;three..",
      "")
    tok.foreach { t =>
      println(s"TOKENIZE [$t] -> " +
        TextPipeline.tokenSet(t, normOnly).map(_._1).mkString("|"))
    }
    println("NORM Henry Ⅷ -> " + Normalizer.nfkcCaseFold("Henry Ⅷ"))
    println("NORM AirForce ① -> " + Normalizer.nfkcCaseFold("AirForce ①"))
    Seq("azúl", "ĄŽUOLĖLIS", "Fuglafjørður", "Árbæ").foreach { s =>
      println(s"DIAC $s -> " + Normalizer.subsDiacritics(s))
    }
    val stems = Seq("jumped" -> "jump", "lazy" -> "lazi", "foxes" -> "fox",
      "cats" -> "cat", "cries" -> "cri", "ties" -> "tie", "flies" -> "fli",
      "dying" -> "die", "agreed" -> "agre", "feed" -> "feed",
      "generously" -> "generous", "national" -> "nation", "rational" -> "ration",
      "relational" -> "relat", "conditional" -> "condit",
      "beautiful" -> "beauti", "hopefulness" -> "hope",
      "running" -> "run", "hopping" -> "hop", "hoping" -> "hope",
      "exceed" -> "exceed", "sensational" -> "sensat",
      "argument" -> "argument", "arguments" -> "argument",
      "happily" -> "happili", "happiness" -> "happi",
      "consolidate" -> "consolid", "controlling" -> "control",
      "controlled" -> "control", "skies" -> "sky", "sky" -> "sky",
      "communism" -> "communism", "generate" -> "generat",
      "generalization" -> "general", "organization" -> "organ",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness2" -> "-",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensibiliti" -> "sensibl", "triplicate" -> "triplic",
      "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "goodness" -> "good", "revival" -> "reviv",
      "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "communism", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas")
    stems.foreach { case (w, exp) =>
      val got = Porter2.stem(w)
      val mark = if (got == exp) "ok " else "MISMATCH"
      println(f"STEM $mark $w%-18s -> $got%-14s (exp $exp)")
    }
  }
}
