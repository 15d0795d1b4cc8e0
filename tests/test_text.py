"""Tokenizer spec tests (SURVEY.md §2.8-1)."""

from zensearch_ray.functions.text import doc_length, term_frequencies, tokenize


def test_basic_split_and_casefold():
    assert tokenize("Dog cat") == ["dog", "cat"]
    # the reference query-tokenizer quirk ("dog cat" -> ["dog", " cat"],
    # score.go:97-116) is intentionally replaced: no leading spaces.
    assert tokenize("dog  cat") == ["dog", "cat"]


def test_punctuation_and_underscore():
    assert tokenize("foo_bar-baz.qux") == ["foo", "bar", "baz", "qux"]
    assert tokenize("a,b;c!d?e") == ["a", "b", "c", "d", "e"]


def test_unicode_nfc_casefold():
    # NFD é (e + combining accent) must equal NFC é after normalization
    assert tokenize("Café") == tokenize("Café")
    # German sharp s casefolds to ss
    assert tokenize("STRASSE") == tokenize("straße")
    # CJK and emoji: CJK chars are word chars, emoji are separators
    assert tokenize("中文 hi\U0001f600yo") == ["中文", "hi", "yo"]


def test_empty_and_numbers():
    assert tokenize("") == []
    assert tokenize("   ...   ") == []
    assert tokenize("v2.0 has 10x") == ["v2", "0", "has", "10x"]


def test_doc_length_and_tf():
    text = "the cat and the hat"
    assert doc_length(text) == 5
    assert term_frequencies(text) == {"the": 2, "cat": 1, "and": 1, "hat": 1}


def test_no_substring_matching():
    # reference A2/A3 used substring counting ("cat" matched "concatenate",
    # tf.go:21, idf.go:24); pinned spec is token equality.
    assert term_frequencies("concatenate").get("cat", 0) == 0


def test_tokenize_stage_positions_matches_reference():
    """Vectorized positional TokenizeStage output == the scalar
    term_positions referee, per doc (order, tfs, positions)."""
    import pyarrow as pa

    from zensearch_ray.functions.text import term_positions
    from zensearch_ray.stages.tokenize import TokenizeStage

    texts = [
        "a b a c b a",
        "the quick the quick the",
        "",
        "one",
        "x y z x y z x y z",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "url": pa.array([f"u{i}" for i in range(len(texts))]),
            "text": pa.array(texts),
        }
    )
    out = TokenizeStage(id_col="doc_id", positions=True)(batch)
    for i, text in enumerate(texts):
        want = term_positions(text)
        assert out["terms"][i].as_py() == list(want.keys())
        assert out["tfs"][i].as_py() == [len(v) for v in want.values()]
        assert out["poss"][i].as_py() == list(want.values())
        assert out["doc_len"][i].as_py() == sum(len(v) for v in want.values())
