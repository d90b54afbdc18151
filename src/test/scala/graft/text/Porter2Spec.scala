package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures derived from the published Snowball english (Porter2) algorithm
  * and its sample vocabulary; the reference applies exactly this stemmer via
  * libstemmer (/root/reference/src/core/filters_builtin.c:206-245). */
class Porter2Spec extends AnyFunSuite {

  val cases: Seq[(String, String)] = Seq(
    // plural / 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
    "cries" -> "cri", "flies" -> "fli", "dies" -> "die",
    "caress" -> "caress", "cats" -> "cat", "foxes" -> "fox",
    "gaps" -> "gap", "gas" -> "gas", "this" -> "this",
    "kiwis" -> "kiwi",
    // 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "controlling" -> "control", "running" -> "run",
    "hoping" -> "hope", "jumped" -> "jump",
    // 1c
    "happy" -> "happi", "sky" -> "sky", "cry" -> "cri",
    "say" -> "say", "crying" -> "cri", "lazy" -> "lazi",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog",
    "vietnamization" -> "vietnam", "predication" -> "predic",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologous" -> "homolog",
    "communism" -> "communism", "activate" -> "activ",
    "angulariti" -> "angular", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // exceptional forms
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
    "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
    "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
    "only" -> "onli", "singly" -> "singl", "news" -> "news",
    "howe" -> "howe", "atlas" -> "atlas", "cosmos" -> "cosmos",
    "bias" -> "bias", "andes" -> "andes",
    // 1a invariants
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // short words / y handling
    "by" -> "by", "a" -> "a", "ow" -> "ow",
    // words from the reference unit-test corpora (t_scoring.c, t_querylogic.c)
    "cats" -> "cat", "dogs" -> "dog", "foxes" -> "fox",
    "little" -> "littl", "textbook" -> "textbook",
    "scripting" -> "script", "examples" -> "exampl",
    "environment" -> "environ", "keywords" -> "keyword",
    "including" -> "includ", "document" -> "document",
    "generously" -> "generous", "arguments" -> "argument")

  test("porter2 golden pairs") {
    val bad = cases.collect {
      case (w, exp) if Porter2.stem(w) != exp =>
        s"$w -> ${Porter2.stem(w)} (expected $exp)"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("idempotent on stems") {
    cases.foreach { case (_, s) =>
      // stems of stems must be stable for pipeline idempotence
      assert(Porter2.stem(Porter2.stem(s)) == Porter2.stem(s))
    }
  }
}
