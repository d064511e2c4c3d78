"""Context window + entity string + HTML extraction goldens.

Windowing semantics from bootleg/dataset.py:173-337 (reproduced with a
whitespace tokenizer — same arithmetic, different segmentation).
"""

from bootleg_spark.functions.textproc import (
    EntityStringConstants,
    WhitespaceTokenizer,
    build_entity_string,
    extract_context,
    extract_html_text,
    render_page_html,
    structural_entity_str,
)


def test_extract_context_marks_span():
    s = "alias1 and alias2 and more words here"
    out = extract_context((0, 6), s, 64)
    assert out == "[ent_start] alias1 [ent_end] and alias2 and more words here"


def test_extract_context_mid_span_no_spaces():
    s = "xxalias1yy more"
    out = extract_context((2, 8), s, 64)
    assert out.split() == ["xx", "[ent_start]", "alias1", "[ent_end]", "yy", "more"]


def test_extract_context_window_shifts_weight():
    left = " ".join(f"l{i}" for i in range(100))
    right = " ".join(f"r{i}" for i in range(100))
    s = f"{left} TARGET {right}"
    start = len(left) + 1
    out = extract_context((start, start + 6), s, 8)
    toks = out.split()
    # equal sides → else-branch: right gets window//2=4, left fills the rest
    assert "[ent_start]" in toks and "[ent_end]" in toks
    assert toks.index("[ent_end]") - toks.index("[ent_start]") == 2
    assert len(toks) <= 8 + 3  # window + markers + mention

    # mention near start → more tokens on the right
    out2 = extract_context((0, 2), s[len(left) - 1 :], 8)
    assert out2.split()[0] in ("[ent_start]",)


def test_structural_entity_str_truncation():
    items = ["one two", "three four", "five six"]
    res, over = structural_entity_str(items, 100, "[ent_kg]")
    assert res == " [ent_kg] one two [ent_kg] three four [ent_kg] five six"
    assert over == 0
    res, over = structural_entity_str(items, 4, "[ent_kg]")
    assert res == " [ent_kg] one two"
    assert over == 1
    res, over = structural_entity_str([], 10, "[ent_kg]")
    assert res == " [ent_kg] "
    assert over == 0


def test_build_entity_string_golden():
    s, spans, ot, ok = build_entity_string(
        title="spark (place)",
        desc="entity for spark variant 1",
        typenames=["place"],
        kg_items=["works_with merge (concept)"],
    )
    assert s == (
        "spark [ent_type] place [ent_kg] works_with merge (concept) "
        "[ent_desc] entity for spark variant 1"
    )
    # title word "spark" found at positions outside [ent_type]..[ent_desc] skip zone
    assert 0 in spans
    assert ot == 0 and ok == 0


def test_build_entity_string_truncates():
    consts = EntityStringConstants(max_ent_kg_len=3, max_ent_type_len=2)
    s, _, ot, ok = build_entity_string(
        "t", "d", ["ty1", "ty2", "ty3"], ["rel a b c", "rel d e f"], consts
    )
    assert ok == 1 and ot == 1
    assert "[ent_kg] rel a b c" in s and "rel d e f" not in s


def test_html_roundtrip():
    text = "the fast key order sort table"
    html = render_page_html(7, text)
    assert extract_html_text(html) == text
    assert extract_html_text(None) is None
    assert extract_html_text(b"<p>a &amp; b</p>") == "a & b"


def test_tokenizer_interface():
    t = WhitespaceTokenizer(model_max_length=16)
    assert t.tokenize("a b  c") == ["a", "b", "c"]
    assert t.convert_tokens_to_string(["a", "b"]) == "a b"


def test_entity_strings_multi_system_requires_named_system(spark):
    """Passing a multi-system type dim without naming a type_system must
    raise (round-2 advice: silently joining every system duplicated one
    entity-string row per system per qid)."""
    import pytest

    from bootleg_spark.operators.linking import entity_strings

    ents = spark.createDataFrame(
        [("Q1", 1, "a", "T1", "d", "ty")], ["qid", "eid", "alias", "title", "descr", "type_name"]
    )
    kg = spark.createDataFrame(
        [], "subj_qid string, rel string, obj_qid string, obj_qnum long"
    )
    types = spark.createDataFrame(
        [("Q1", "wiki", ["a"]), ("Q1", "hyena", ["b"])],
        "qid string, type_system string, typenames array<string>",
    )
    with pytest.raises(ValueError, match="type_system"):
        entity_strings(ents, kg, entity_types=types).collect()
    # naming a system works
    out = entity_strings(ents, kg, entity_types=types, type_system="wiki").collect()
    assert len(out) == 1


def test_word_char_span_conversion_fuzz():
    """word_spans_to_char_spans vs a direct transcription of the
    reference's char2word/word2char algorithm
    (convert_to_char_spans.py:44-62), over texts with tabs, newlines,
    multi-space runs and leading/trailing whitespace; plus the
    backwards-compat round trip through the reference's char→word
    prefix-split formula (mention_extractor_utils.py:202)."""
    import random

    from bootleg_spark.functions.textproc import (
        char_span_to_word_span,
        word_spans_to_char_spans,
    )

    def reference_model(text, spans):
        from collections import defaultdict

        word_i, prev_is_space = 0, True
        word2char = defaultdict(list)
        for char_i, c in enumerate(text):
            if c.isspace():
                if not prev_is_space:
                    word_i += 1
                    prev_is_space = True
            else:
                prev_is_space = False
                word2char[word_i].append(char_i)
        return [
            [min(word2char[s[0]]), max(word2char[s[1] - 1]) + 1] for s in spans
        ]

    rng = random.Random(99)
    pieces = ["word", "a", "Xy9", "ünïcode", "p.q", ""]
    seps = [" ", "  ", "\t", "\n", " \t ", " "]  # NBSP is isspace
    for _ in range(500):
        n = rng.randrange(1, 9)
        text = seps[rng.randrange(len(seps))] if rng.random() < 0.3 else ""
        words = 0
        for i in range(n):
            w = pieces[rng.randrange(len(pieces) - 1)]  # skip ""
            text += w
            words += 1
            text += seps[rng.randrange(len(seps))]
        if rng.random() < 0.5:
            text = text.rstrip()
        spans = []
        for _s in range(rng.randrange(1, 4)):
            w0 = rng.randrange(0, words)
            w1 = rng.randrange(w0 + 1, words + 1)
            spans.append([w0, w1])
        got = word_spans_to_char_spans(text, spans)
        assert got == reference_model(text, spans), (text, spans)
        # round trip (str.split == isspace-run words)
        for (w0, w1), (cl, cr) in zip(spans, got):
            assert char_span_to_word_span(text, cl, cr) == [w0, w1], (text, spans)
    # out-of-range span raises instead of mis-mapping
    import pytest as _pytest

    with _pytest.raises(ValueError):
        word_spans_to_char_spans("one two", [[0, 3]])
