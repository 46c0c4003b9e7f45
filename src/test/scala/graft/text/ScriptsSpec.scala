package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the script-mix / homograph audit (q222, T131). */
class ScriptsSpec extends AnyFunSuite {

  test("scriptMix: pure scripts, COMMON exclusion, supplementary " +
      "code points") {
    val latin = Scripts.scriptMix("example7.com")
    assert(latin.dominant == "LATIN" && !latin.mixed &&
      !latin.confusableRisk && latin.nScripts == 1)
    val none = Scripts.scriptMix("123 .-?!")
    assert(none.dominant == "NONE" && none.nScripts == 0)
    val cyr = Scripts.scriptMix("привет")
    assert(cyr.dominant == "CYRILLIC" && !cyr.mixed)
    // supplementary plane: Gothic U+10330 must not crash the walk
    val goth = Scripts.scriptMix(new String(Character.toChars(0x10330)))
    assert(goth.dominant == "GOTHIC")
  }

  test("mixed + risk rules: Latin/Cyrillic and Latin/Greek flag, " +
      "CJK mixes do not") {
    val spoof = Scripts.scriptMix("exаmple.com") // Cyrillic а
    assert(spoof.mixed && spoof.confusableRisk && spoof.nScripts == 2)
    val greek = Scripts.scriptMix("demο.net") // Greek ο
    assert(greek.mixed && greek.confusableRisk)
    val cjk = Scripts.scriptMix("例え.jp") // Han + Hiragana + Latin tld
    assert(cjk.mixed && !cjk.confusableRisk && cjk.nScripts == 3)
    val cyrGreek = Scripts.scriptMix("аο") // no Latin at all
    assert(cyrGreek.mixed && !cyrGreek.confusableRisk)
  }

  test("skeleton + spoofs: confusables fold to Latin, case folds, " +
      "non-confusables survive") {
    assert(Scripts.skeleton("exаmple") == "example")
    assert(Scripts.skeleton("ον") == "ov") // Greek ο ν
    assert(Scripts.skeleton("EXAMPLE") == "example")
    assert(Scripts.spoofs("exаmple.com", "example.com"))
    assert(Scripts.spoofs("pаypаl.com", "paypal.com"))
    assert(!Scripts.spoofs("example.com", "example.com")) // identical
    assert(!Scripts.spoofs("exbmple.com", "example.com"))
    // ш has no Latin lookalike: stays itself, never spoofs
    assert(!Scripts.spoofs("exшmple.com", "example.com"))
    // uppercase confusables whose mapping lives on the LOWERCASE char
    // (Cyrillic У lowercases to у before the lookup)
    assert(Scripts.skeleton("Уber.com") == "yber.com")
    assert(Scripts.spoofs("Уber.com", "Yber.com"))
    // and ones whose mapping lives on the RAW uppercase char (В→b;
    // lowercase в is not visually Latin and must not be folded via
    // the raw path... it maps through the uppercase entry only)
    assert(Scripts.skeleton("Вank") == "bank")
  }
}
