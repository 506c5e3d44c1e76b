package graft

import graft.core.TextSpec
import org.scalatest.funsuite.AnyFunSuite

class TextSpecSuite extends AnyFunSuite {

  test("titleCase matches Python str.title() semantics (extractor.py:113-115)") {
    assert(TextSpec.titleCase("  jwt   tokens ") == "Jwt Tokens")
    assert(TextSpec.titleCase("don't stop") == "Don'T Stop") // Python: "Don'T Stop"
    assert(TextSpec.titleCase("oauth2 tokens") == "Oauth2 Tokens")
    assert(TextSpec.titleCase("a-b c") == "A-B C")
    assert(TextSpec.titleCase("ALL CAPS") == "All Caps")
    assert(TextSpec.titleCase("") == "")
  }

  test("tokenize: lowercase words minus stopwords, as a set (pruning.py:204-305)") {
    val t = TextSpec.tokenize("The Auth Module requires the Session Store!")
    assert(t == Set("auth", "module", "requires", "session", "store"))
    assert(TextSpec.tokenize("") == Set.empty[String])
    assert(TextSpec.tokenize(null) == Set.empty[String])
    // digits are not [a-z]+ words
    assert(TextSpec.tokenize("v2 only 42") == Set.empty[String])
  }

  test("jaccard (pruning.py:308-314)") {
    assert(TextSpec.jaccard(Set("a", "b"), Set("b", "c")) == 1.0 / 3.0)
    assert(TextSpec.jaccard(Set.empty, Set("x")) == 0.0)
    assert(TextSpec.jaccard(Set("x"), Set("x")) == 1.0)
  }

  test("chunkId: sha256(source:idx:text[:64])[:16] (chunker.py:71-82)") {
    val id = TextSpec.chunkId("src", 0, "hello world")
    assert(id.length == 16)
    assert(id == TextSpec.chunkId("src", 0, "hello world")) // stable
    assert(id != TextSpec.chunkId("src", 1, "hello world"))
    // only the first 64 chars participate
    val long64 = "x" * 64
    assert(TextSpec.chunkId("s", 0, long64 + "AAA") == TextSpec.chunkId("s", 0, long64 + "BBB"))
  }

  test("verb→relation map verbatim (extractor.py:102-110, 367-380)") {
    for (v <- Seq("use", "utilize", "call", "invoke")) assert(TextSpec.verbToRelation(v) == "USES")
    for (v <- Seq("require", "need", "depend", "import")) assert(TextSpec.verbToRelation(v) == "REQUIRES")
    for (v <- Seq("contain", "include", "have", "hold")) assert(TextSpec.verbToRelation(v) == "CONTAINS")
    for (v <- Seq("implement", "extend", "inherit")) assert(TextSpec.verbToRelation(v) == "IMPLEMENTS")
    for (v <- Seq("refine", "specialize", "customize")) assert(TextSpec.verbToRelation(v) == "REFINES")
    assert(TextSpec.verbToRelation("frobnicate") == "RELATED_TO")
  }

  test("lemma normalizes inflections of the relation verbs") {
    assert(TextSpec.lemma("uses") == "use")
    assert(TextSpec.lemma("using") == "use")
    assert(TextSpec.lemma("requires") == "require")
    assert(TextSpec.lemma("needs") == "need")
    assert(TextSpec.lemma("has") == "have")
    assert(TextSpec.lemma("contains") == "contain")
    assert(TextSpec.lemma("implements") == "implement")
    assert(TextSpec.lemma("extends") == "extend")
    assert(TextSpec.lemma("includes") == "include")
    assert(TextSpec.lemma("invokes") == "invoke")
    assert(TextSpec.lemma("refines") == "refine")
  }
}
