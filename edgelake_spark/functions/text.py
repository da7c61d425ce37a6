"""Text analysis operators: tokenization, language-ID, quality scoring,
token counting, document fingerprinting.

Everything is a pure SQL expression over built-in functions (JVM-side,
codegen'd — no UDFs), and every builder has a ``duck_*`` twin emitting
the DuckDB-equivalent SQL from the same constants for the oracle gate.
Cross-engine determinism: md5 for hashing, regex classes limited to
ASCII, arithmetic in identical order.
"""

from __future__ import annotations

# word characters for tokenization; everything else is a separator
TOKEN_SEP = "[^a-z0-9]+"

# small deterministic stopword lists for the n-gram/stopword language
# heuristic (alphabetical language order = deterministic tie-break)
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "sich"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "los", "las", "es", "que", "de", "en", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"],
}

PUNCT_CLASS = r"[.,;:!?]"


# ------------------------------------------------------------ tokenize


def spark_tokens(col: str) -> str:
    return f"filter(split(lower({col}), '{TOKEN_SEP}'), x -> x != '')"


def duck_tokens(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '{TOKEN_SEP}'), x -> x != '')"


# ----------------------------------------------------------- stopwords


def _spark_stop_count(tokens_expr: str, words: list[str]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return f"size(filter({tokens_expr}, x -> array_contains({arr}, x)))"


def _duck_stop_count(tokens_expr: str, words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({tokens_expr}, x -> list_contains({arr}, x)))"


def spark_language_id(col: str) -> str:
    """Predicted language = alphabetically-first language with the
    maximal stopword hit count (n-gram heuristic)."""
    toks = spark_tokens(col)
    scores = {lang: _spark_stop_count(toks, ws) for lang, ws in sorted(STOPWORDS.items())}
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang in sorted(STOPWORDS)
    )
    return f"CASE {cases} ELSE 'unknown' END"


def duck_language_id(col: str) -> str:
    toks = duck_tokens(col)
    scores = {lang: _duck_stop_count(toks, ws) for lang, ws in sorted(STOPWORDS.items())}
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang in sorted(STOPWORDS)
    )
    return f"CASE {cases} ELSE 'unknown' END"


# ------------------------------------------------------- quality score


def spark_quality_parts(col: str) -> dict[str, str]:
    """Length / punctuation / stopword ratio components. All doubles are
    produced by the same operation sequence as the DuckDB twin."""
    toks = spark_tokens(col)
    stop = _spark_stop_count(toks, STOPWORDS["en"])
    return {
        "n_chars_q": f"CAST(length({col}) AS BIGINT)",
        "n_tokens": f"CAST(size({toks}) AS BIGINT)",
        "avg_token_len": (
            f"CAST(aggregate({toks}, 0L, (a, x) -> a + length(x)) AS DOUBLE)"
            f" / CAST(greatest(size({toks}), 1) AS DOUBLE)"
        ),
        "punct_ratio": (
            f"CAST(length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', '')) AS DOUBLE)"
            f" / CAST(greatest(length({col}), 1) AS DOUBLE)"
        ),
        "stopword_ratio": (
            f"CAST({stop} AS DOUBLE) / CAST(greatest(size({toks}), 1) AS DOUBLE)"
        ),
    }


def duck_quality_parts(col: str) -> dict[str, str]:
    toks = duck_tokens(col)
    stop = _duck_stop_count(toks, STOPWORDS["en"])
    return {
        "n_chars_q": f"CAST(length({col}) AS BIGINT)",
        "n_tokens": f"CAST(len({toks}) AS BIGINT)",
        "avg_token_len": (
            f"CAST(list_sum(list_transform({toks}, x -> length(x))) AS DOUBLE)"
            f" / CAST(greatest(len({toks}), 1) AS DOUBLE)"
        ),
        "punct_ratio": (
            f"CAST(length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)"
            f" / CAST(greatest(length({col}), 1) AS DOUBLE)"
        ),
        "stopword_ratio": (
            f"CAST({stop} AS DOUBLE) / CAST(greatest(len({toks}), 1) AS DOUBLE)"
        ),
    }


QUALITY_SCORE = (
    # one linear formula over the ratio components; identical literal
    # order both engines → bit-identical doubles
    "(least({avg_token_len} / 8.0, 1.0) * 0.4"
    " + least({stopword_ratio} * 4.0, 1.0) * 0.4"
    " + (1.0 - least({punct_ratio} * 10.0, 1.0)) * 0.2)"
)


def spark_quality_score(col: str) -> str:
    return QUALITY_SCORE.format(**spark_quality_parts(col))


def duck_quality_score(col: str) -> str:
    return QUALITY_SCORE.format(**duck_quality_parts(col))


# ------------------------------------------------------- token counts


#: BPE-ish token regex: runs of letters, runs of digits, single other
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def spark_bpe_count(col: str) -> str:
    return f"CAST(size(regexp_extract_all(lower({col}), '{TOKEN_REGEX}', 0)) AS BIGINT)"


def duck_bpe_count(col: str) -> str:
    return f"CAST(len(regexp_extract_all(lower({col}), '{TOKEN_REGEX}', 0)) AS BIGINT)"


# -------------------------------------------------------- fingerprint


def spark_fingerprint(col: str) -> str:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized lowercase text."""
    return f"md5(regexp_replace(trim(lower({col})), '\\\\s+', ' '))"


def duck_fingerprint(col: str) -> str:
    return f"md5(regexp_replace(trim(lower({col})), '\\s+', ' ', 'g'))"


# ----------------------------------------------------------- winnowing

#: winnowing parameters: character k-grams, window of w consecutive
#: k-gram hashes (Schleimer, Wilkerson, Aiken, "Winnowing: Local
#: Algorithms for Document Fingerprinting", SIGMOD 2003). Guarantee:
#: any shared substring of length >= WINNOW_K + WINNOW_W - 1 produces
#: at least one shared fingerprint.
WINNOW_K = 5
WINNOW_W = 4


def spark_gram_hashes(col: str) -> str:
    """Positional (non-distinct) character k-gram 60-bit md5 hashes of a
    pre-staged normalized text column. Stage THIS as a column too before
    applying spark_winnow_fps_over — HOF lambdas get no subexpression
    elimination (see staging note in functions/dedup.py)."""
    k = WINNOW_K
    grams = (
        f"transform(sequence(1, greatest(length({col}) - {k - 1}, 1)), "
        f"i -> substr({col}, i, {k}))"
    )
    return (
        f"transform({grams}, g -> "
        f"CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )


def spark_winnow_fps_over(hs: str) -> str:
    """Winnowing fingerprint set over a pre-staged gram-hash array:
    per-window min, then distinct. A pure map-side array pipeline — no
    shuffle, no UDF; at 100 TB this runs inside the scan stage. (Window
    min is the ties-by-value variant: selecting the min VALUE per window
    yields the same fingerprint SET as rightmost-position selection.)"""
    w = WINNOW_W
    return (
        f"array_distinct(transform(sequence(1, greatest(size({hs}) - {w - 1}, 1)), "
        f"i -> array_min(slice({hs}, i, {w}))))"
    )


def duck_gram_hashes(col: str) -> str:
    k = WINNOW_K
    grams = (
        f"[({col})[p:p+{k - 1}] "
        f"for p in range(1, greatest(length({col}) - {k - 1}, 1) + 1)]"
    )
    return (
        f"[CAST(list_sum([CAST(strpos('0123456789abcdef', (md5(g))[c:c]) - 1 AS BIGINT)"
        f" << (4*(15-c)) for c in range(1, 16)]) AS BIGINT) for g in {grams}]"
    )


def duck_winnow_fps_over(hs: str) -> str:
    w = WINNOW_W
    return (
        f"list_distinct([list_min(({hs})[p:p+{w - 1}]) "
        f"for p in range(1, greatest(len({hs}) - {w - 1}, 1) + 1)])"
    )


# ---------------------------------------------------------- BPE apply


def bpe_apply_expr(engine: str, col: str, merges) -> str:
    """Pure-SQL BPE encoder: apply a FIXED ordered merge list to the
    word in ``col`` and return the final symbol array.

    Encoding: each character is wrapped in its own ``<...>`` unit
    (``<a><b><c>``), and a merge rule (l, r) -> lr is one
    ``replace(s, '<l><r>', '<lr>')``. Units are disjoint (no shared
    boundary characters), so SQL replace's non-overlapping
    left-to-right scan fuses exactly the pairs the greedy trainer
    rewrite in bpe_train_merges fuses — the single-separator encoding
    fails here because consecutive pairs share the boundary space.
    Both engines' replace() have identical scan semantics, so the
    emission is engine-exact; ``<`` and ``>`` cannot collide with token
    text (tokens match [a-z0-9]+ only, see TOKEN_SEP).

    Scale shape: the merge list is a tokenizer artifact (tens of kB,
    inlined into the plan / broadcast for free); encoding is a chain of
    map-side string rewrites — no shuffle, codegen'd end to end.
    """
    if engine == "spark":
        enc = f"regexp_replace({col}, '(.)', '<$1>')"
    else:
        enc = f"regexp_replace({col}, '(.)', '<\\1>', 'g')"
    for _rank, left, right, merged, _freq in merges:
        enc = f"replace({enc}, '<{left}><{right}>', '<{merged}>')"
    return f"regexp_extract_all({enc}, '<([^<>]+)>', 1)"


def bpe_apply_py(word: str, merges) -> list[str]:
    """Pure-Python reference for bpe_apply_expr (property tests)."""
    syms = list(word)
    for _rank, left, right, merged, _freq in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# ------------------------------------------------------- BPE training


def bpe_train_merges(word_freqs, n_merges: int = 10):
    """Train byte-pair-encoding merge rules over a (word, freq)
    vocabulary (Sennrich et al. 2016): repeatedly count weighted
    adjacent-symbol pairs, pick the most frequent (ties broken
    lexicographically — fully deterministic), and fuse it everywhere.

    This is the DRIVER-SIDE half of distributed BPE training, and it is
    driver-side on purpose: the corpus collapses to its vocabulary in
    ONE Spark aggregation (the only corpus-sized stage — what
    doc_bpe_pairs measures), and every production trainer
    (HF tokenizers, SentencePiece) then iterates over that
    vocabulary-bounded table in memory, because each merge rule depends
    on the table REWRITTEN by all previous rules — an inherently
    sequential recurrence. Same boundedness argument as the
    connected-components union-find (functions/dedup.py).

    Returns [(rank, left, right, merged, pair_freq), ...].
    """
    vocab = {}
    for word, freq in word_freqs:
        syms = tuple(word)
        if len(syms) >= 2:
            vocab[syms] = vocab.get(syms, 0) + int(freq)
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # max by (freq, reversed-lex): the LOWEST pair wins ties so the
        # rule order is reproducible across runs and engines
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right
        merges.append((rank, left, right, merged, best))
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + freq
        vocab = new_vocab
    return merges
