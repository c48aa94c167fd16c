package graft.functions

/** The committed BPE vocabulary: 48 merges trained by
  * [[graft.tools.BpeTrain]] on the fixture corpus
  * `/root/testdata/sf0.001/documents.parquet` (500 docs, corpus
  * fingerprint -6834655406163486726L). GENERATED — do not hand-edit: BpeSpec retrains
  * from the same corpus with [[Bpe.train]] and asserts equality with this
  * table (guarded by the fingerprint, so a regenerated fixture corpus
  * skips rather than false-fails). Merge rank j is encoded as the
  * private-use char U+{E000+j}; pair members are either base alphabet
  * chars ([a-z ], the placeholder) or earlier merge chars. */
object BpeVocab {
  val corpusFingerprint: Long = -6834655406163486726L
  val merges: Seq[(String, String)] = Seq(
    (" ", "s"),
    ("e", "r"),
    ("e", " "),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("t", " "),
    ("\ue001", " "),
    ("\ue005", " "),
    ("l", "u"),
    ("a", "r"),
    ("p", "\ue00a"),
    ("a", "s"),
    ("a", "t"),
    ("n", " "),
    ("y", " "),
    ("g", " "),
    ("h", " "),
    ("a", " "),
    ("m", "\ue001"),
    ("c", "a"),
    ("c", "o"),
    ("\ue009", "m"),
    ("\ue015", "\ue016"),
    ("w", "\ue004"),
    ("\ue018", "d"),
    ("\ue003", "d"),
    ("u", "p"),
    ("\ue000", "\ue003"),
    ("\ue000", "\ue014"),
    ("a", "g"),
    ("a", "\ue009"),
    ("v", "\ue01f"),
    ("l", "\ue004"),
    ("k", "e"),
    ("j", "o"),
    ("\ue023", "\ue004"),
    ("\ue013", "g"),
    ("g", "r"),
    ("o", "\ue01b"),
    ("q", "u"),
    ("\ue026", "\ue027"),
    ("\ue028", "\ue001"),
    ("c", "t"),
    ("e", "\ue02b"),
    ("v", "\ue02c"),
    ("\ue02d", "\ue003"),
    ("h", "\ue00c"))
}
