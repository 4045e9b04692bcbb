"""Golden Lucene-StandardAnalyzer tokenizations (VERDICT weak #10).

A static fixture of tricky strings with the token streams Lucene's
``standard`` analyzer (StandardTokenizer = UAX#29 word-break grammar, then
LowerCaseFilter — what ES applies per ``/root/reference/kb/build_kb.py:17-22``)
produces for them. Derived from the UAX#29 rules the jflex grammar encodes:
WB5-13b joins, MidLetter/MidNumLet/Single_Quote/MidNum medial characters,
ExtendNumLet (underscore) joining, Han/Hiragana single-char tokens, Katakana
runs, combining-mark attachment. No network/Lucene needed at test time —
the fixture IS the recorded expectation.
"""

import pytest

from kbner_tpu.retrieval.analyzer import cjk_analyze, standard_analyze

# (input, expected tokens from Lucene `standard`)
GOLDEN = [
    # basic latin + punctuation boundaries
    ("The quick brown fox.", ["the", "quick", "brown", "fox"]),
    ("Hello, World!", ["hello", "world"]),
    ("", []),
    ("   \t\n  ", []),
    ("...", []),
    ("- -- -", []),
    # apostrophes: Single_Quote joins letter'letter (WB6/7)
    ("don't", ["don't"]),
    ("O'Neill's", ["o'neill's"]),
    ("it's a test", ["it's", "a", "test"]),
    ("'quoted'", ["quoted"]),          # leading/trailing quote drops
    ("a' b", ["a", "b"]),
    ("rock 'n' roll", ["rock", "n", "roll"]),
    # curly apostrophe U+2019 is MidNumLet: joins letters
    ("don’t", ["don’t"]),
    # full stop is MidNumLet: joins letter.letter and digit.digit
    ("U.S.A. is big", ["u.s.a", "is", "big"]),
    ("example.com", ["example.com"]),
    ("www.example.co.uk", ["www.example.co.uk"]),
    ("End of sentence. Next", ["end", "of", "sentence", "next"]),
    ("3.14", ["3.14"]),
    ("192.168.0.1", ["192.168.0.1"]),
    ("v2.0", ["v2.0"]),                 # 2.0 joins within the alnum run
    ("a.4", ["a", "4"]),                # letter.digit does NOT join
    ("4.a", ["4", "a"]),
    # comma is MidNum: joins digits only
    ("1,000,000", ["1,000,000"]),
    ("a,b", ["a", "b"]),
    ("10,20 30", ["10,20", "30"]),
    # hyphens and slashes always break
    ("e-mail", ["e", "mail"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("can't-go", ["can't", "go"]),
    ("AC/DC", ["ac", "dc"]),
    # @ breaks (standard analyzer is not the email tokenizer)
    ("user@example.com", ["user", "example.com"]),
    ("http://example.com/page", ["http", "example.com", "page"]),
    # underscore is ExtendNumLet: joins everything adjacent (WB13a/b)
    ("foo_bar", ["foo_bar"]),
    ("a_b_c", ["a_b_c"]),
    ("snake_case_2", ["snake_case_2"]),
    ("_private", ["_private"]),
    ("trailing_", ["trailing_"]),
    ("__", []),                         # no letter/digit core -> no token
    # alphanumeric runs join (WB9/10)
    ("MP3 players", ["mp3", "players"]),
    ("R2D2", ["r2d2"]),
    ("R2-D2", ["r2", "d2"]),
    ("42", ["42"]),
    ("100%", ["100"]),
    ("$99.99", ["99.99"]),
    ("12:30pm", ["12", "30pm"]),        # colon does not join digits
    # case folding
    ("LOUD Noises", ["loud", "noises"]),
    ("McDonald's", ["mcdonald's"]),
    # latin-1 / diacritics (precomposed)
    ("über café naïve", ["über", "café", "naïve"]),
    ("Fünf Straßen", ["fünf", "straßen"]),
    # combining marks attach (WB4): decomposed é stays in-token
    ("café time", ["café", "time"]),
    # greek / cyrillic
    ("Ελληνικά κείμενο", ["ελληνικά", "κείμενο"]),
    ("Москва-река", ["москва", "река"]),
    ("ПРИВЕТ42мир", ["привет42мир"]),
    # hebrew (points are Mn -> attach); arabic
    ("עִבְרִית", ["עִבְרִית"]),
    ("العربية النص", ["العربية", "النص"]),
    # devanagari with virama/matras (Mn/Mc attach)
    ("हिन्दी पाठ", ["हिन्दी", "पाठ"]),
    ("বাংলা", ["বাংলা"]),
    # hangul syllables are letters: runs join (NOT per-char)
    ("한국어 텍스트", ["한국어", "텍스트"]),
    ("한국어2018", ["한국어2018"]),
    # han: one token per ideograph
    ("日本語", ["日", "本", "語"]),
    ("北京大学", ["北", "京", "大", "学"]),
    ("abc北京def", ["abc", "北", "京", "def"]),
    ("漢字2個", ["漢", "字", "2", "個"]),
    # hiragana: one token per char; katakana: runs join (WB13)
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("カタカナ", ["カタカナ"]),
    ("日本語のテキスト", ["日", "本", "語", "の", "テキスト"]),
    ("テスト123", ["テスト", "123"]),    # katakana-digit does not join
    # mixed CJK + latin
    ("中文word混合", ["中", "文", "word", "混", "合"]),
    ("Wikipedia（ウィキペディア）は", ["wikipedia", "ウィキペディア", "は"]),
    # digits in other scripts (Nd)
    ("٤٢ عدد", ["٤٢", "عدد"]),
    ("１２３", ["１２３"]),               # fullwidth digits are Nd
    # mid chars at token edges never join
    (".start", ["start"]),
    ("end.", ["end"]),
    (",5", ["5"]),
    ("5,", ["5"]),
    ("'", []),
    ("won't.", ["won't"]),
    ("etc., and", ["etc", "and"]),      # comma can't join letter context
    # single letters / short tokens
    ("a b c", ["a", "b", "c"]),
    ("x", ["x"]),
]


@pytest.mark.parametrize("text,want", GOLDEN, ids=[g[0][:24] for g in GOLDEN])
def test_standard_analyze_lucene_golden(text, want):
    assert standard_analyze(text) == want


def test_cjk_analyze_bigrams_on_han_runs():
    toks = cjk_analyze("北京大学")
    # unigrams plus overlapping bigrams, ik_max_word-style coverage
    for t in ["北", "京", "大", "学", "北京", "京大", "大学"]:
        assert t in toks
    # bigrams never span a non-Han token
    toks2 = cjk_analyze("北a京")
    assert "北京" not in toks2


def test_analyzer_idempotent_token_chars():
    # analyzing a produced token reproduces itself (stability under
    # re-analysis, needed for query-side == index-side tokenization)
    for text, want in GOLDEN:
        for tok in want:
            assert standard_analyze(tok) == [tok], tok
