"""Golden unit tests for the pure kernels (SURVEY.md §5 step 2).

Goldens are derived from the reference's documented semantics (file:line
cited in each kernel's docstring), computed by hand here — not by running
the reference.
"""

from __future__ import annotations

import numpy as np
import pytest

from web_crawler_search_engine_ray.functions import hashing as H
from web_crawler_search_engine_ray.functions import text as T
from web_crawler_search_engine_ray.functions import urls as U
from web_crawler_search_engine_ray.functions.porter import stem


class TestNormalize:
    # web_crawler/utils/__init__.py:34-38 semantics
    def test_lowercase_and_scheme(self):
        assert U.normalize("HTTP://W0.Example.org/Path") == "https://w0.example.org/path"

    def test_unquote(self):
        assert U.normalize("https://a.org/%7Euser") == "https://a.org/~user"
        assert U.normalize("https://a.org/%73") == "https://a.org/s"

    def test_trailing_slashes_all_stripped(self):
        assert U.normalize("https://a.org/x///") == "https://a.org/x"
        assert U.normalize("https://a.org/x") == "https://a.org/x"

    def test_batch_matches_scalar(self):
        urls = ["HTTP://A.org/", "https://b.org/%20x/", "https://c.org/y"]
        assert U.normalize_batch(urls) == [U.normalize(u) for u in urls]


class TestValidity:
    ROOTS = ("example.org",)

    @pytest.mark.parametrize(
        "url,ok",
        [
            ("https://w0.example.org/a/b", True),
            ("ftp://w0.example.org/a", False),          # scheme
            ("mailto:x@example.org", False),            # scheme
            ("https://evil.net/a", False),              # domain
            ("https://w0.example.org/a/b/a", False),    # duplicate segments
            ("https://w0.example.org/wiki/doku.php", False),
            ("https://w0.example.org/f.pdf", False),    # extension blacklist
            ("https://w0.example.org/f.pdf?x=1", False),  # path keeps .pdf
            ("https://w0.example.org/p?ical=1", False),
            ("https://w0.example.org/p?afg12_page_id=3", False),
            ("https://w0.example.org/p?color_filter=x", False),
            ("https://w0.example.org/p?page=2", True),
            ("https://w0.example.org", True),           # empty path valid
        ],
    )
    def test_is_valid(self, url, ok):
        assert U.is_valid(url, self.ROOTS) is ok

    def test_batch_matches_scalar(self):
        urls = [
            "https://w0.example.org/a",
            "https://other.net/a",
            "https://w0.example.org/x/x",
            "https://w0.example.org/q?share=1",
        ]
        mask = U.is_valid_batch(urls, self.ROOTS)
        assert mask.tolist() == [U.is_valid(u, self.ROOTS) for u in urls]


class TestResolveLinks:
    def test_relative_absolute_fragment(self):
        base = "https://w0.example.org/s0/p1"
        out = U.resolve_links(base, ["/s0/p2", "p3", "https://w1.example.org/x#frag", "#here"])
        assert out == [
            "https://w0.example.org/s0/p2",
            "https://w0.example.org/s0/p3",
            "https://w1.example.org/x",
            "https://w0.example.org/s0/p1",
        ]


class TestTokenizers:
    def test_t1_ascii_alnum_runs(self):
        # shared/tokenizer.py:27-46: maximal ASCII-alnum runs, lowercased
        assert T.tokenize("Hello, WORLD-42!") == ["hello", "world", "42"]
        assert T.tokenize("naïve café") == ["na", "ve", "caf"]  # non-ascii splits
        assert T.tokenize("foo_bar") == ["foo", "bar"]  # '_' is not alnum

    def test_word_tokens_boundary_semantics(self):
        # \b[a-zA-Z0-9]+\b: underscore is a word char, so foo_bar yields nothing
        assert T.word_tokens("foo_bar") == []
        assert T.word_tokens("Hello, WORLD-42!") == ["hello", "world", "42"]

    def test_word_tokens_numeric_filter(self):
        # numbers longer than 4 digits dropped (shared/tokenizer.py:54)
        assert T.word_tokens("1234 12345 a12345") == ["1234", "a12345"]

    def test_ngram_counts(self):
        # per-fragment 1/2/3-grams; all-numeric n-grams dropped
        c = T.tokenize_with_ngrams(["big data rocks"])
        assert c["big"] == 1 and c["big data"] == 1 and c["big data rocks"] == 1
        c2 = T.tokenize_with_ngrams(["12 34"])
        assert "12 34" not in c2 and c2["12"] == 1  # all-numeric bigram dropped

    def test_ngrams_do_not_cross_fragments(self):
        c = T.tokenize_with_ngrams(["big data", "rocks hard"])
        assert "data rocks" not in c
        assert c["big data"] == 1 and c["rocks hard"] == 1

    def test_word_frequencies(self):
        assert T.compute_word_frequencies(["a", "b", "a"]) == {"a": 2, "b": 1}

    def test_query_tokens_ngram_width(self):
        # n = clamp(len-1, 1, 3): 3 tokens -> bigrams
        primary, fallback = T.query_tokens("machine learning systems")
        assert "machine learning" in primary and "learning systems" in primary
        assert fallback == [stem("machine"), stem("learning"), stem("systems")]
        p1, _ = T.query_tokens("database")
        assert p1 == ["database"] + ([stem("database")] if stem("database") != "database" else [])


class TestProfiles:
    SPANS_KINDS = ["title", "text", "script", "link", "style", "h1", "code", "image"]
    SPANS_TEXTS = ["My  Title", "body one", "var x", "anchor", ".x{}", " head ", "print", "alt"]

    def test_posting_profile_keeps_title(self):
        frags = T.extract_profile_text(self.SPANS_KINDS, self.SPANS_TEXTS, T.PROFILE_POSTING)
        assert frags == ["My Title", "body one", "anchor", "head", "alt"] or frags == [
            "My Title", "body one", "anchor", "head"]

    def test_crawl_profile_drops_title(self):
        frags = T.extract_profile_text(self.SPANS_KINDS, self.SPANS_TEXTS, T.PROFILE_CRAWL)
        assert "My Title" not in frags
        assert "body one" in frags and "anchor" in frags and "head" in frags
        assert "var x" not in frags and ".x{}" not in frags and "print" not in frags


class TestPorter:
    # classic Porter (1980) examples from the published paper
    @pytest.mark.parametrize(
        "word,expected",
        [
            ("caresses", "caress"),
            ("ponies", "poni"),
            ("caress", "caress"),
            ("cats", "cat"),
            ("feed", "feed"),
            ("agreed", "agre"),
            ("plastered", "plaster"),
            ("motoring", "motor"),
            ("conflated", "conflat"),
            ("troubled", "troubl"),
            ("sized", "size"),
            ("hopping", "hop"),
            ("falling", "fall"),
            ("hissing", "hiss"),
            ("failing", "fail"),
            ("happy", "happi"),
            ("relational", "relat"),
            ("conditional", "condit"),
            ("rational", "ration"),
            ("digitizer", "digit"),
            ("conformabli", "conform"),
            ("triplicate", "triplic"),
            ("formative", "form"),
            ("formalize", "formal"),
            ("revival", "reviv"),
            ("allowance", "allow"),
            ("inference", "infer"),
            ("adjustment", "adjust"),
            ("probate", "probat"),
            ("controll", "control"),
            ("roll", "roll"),
        ],
    )
    def test_paper_examples(self, word, expected):
        assert stem(word) == expected


class TestHashing:
    def test_poly_hash_matches_reference_arithmetic(self):
        # h = ((h*31)+ord(c)) mod 2^32, computed here by the direct loop
        def ref(s):
            h = 0
            for ch in s:
                h = (h * 31 + ord(ch)) % (2**32)
            return h

        for s in ["", "a", "hello world", "x" * 1000, "unicode: héllo ☃"]:
            assert H.poly_hash(s) == ref(s)

    def test_poly_hash_batch(self):
        texts = ["abc", "", "same", "same"]
        out = H.poly_hash_batch(texts)
        assert out[2] == out[3] and out[0] != out[2]

    def test_hash64_deterministic(self):
        a = U.hash64_batch(["x", "y", "x"])
        b = U.hash64_batch(["x", "y", "x"])
        assert (a == b).all() and a[0] == a[2] and a[0] != a[1]

    def test_hash64_is_fnv1a_spec(self):
        """hash64_batch is pinned to the FNV-1a 64 spec (HASH_IMPL) — a
        dependency upgrade must NOT be able to move checkpointed shard
        keys. Known-answer vectors from the published FNV test suite."""
        assert U.HASH_IMPL == "fnv1a64/1"
        # canonical FNV-1a 64 vectors (Noll's reference test suite)
        assert U.fnv1a64("") == 0xCBF29CE484222325
        assert U.fnv1a64("a") == 0xAF63DC4C8601EC8C
        assert U.fnv1a64("foobar") == 0x85944171F73967E8
        vals = U.hash64_batch(["", "a", "foobar"])
        assert [int(v) for v in vals] == [
            0xCBF29CE484222325,
            0xAF63DC4C8601EC8C,
            0x85944171F73967E8,
        ]

    def test_hash64_batch_matches_scalar_reference(self):
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.text(max_size=64), max_size=40))
        def check(strings):
            got = U.hash64_batch(strings)
            want = np.array(
                [U.fnv1a64(s) for s in strings], dtype=np.uint64
            ).reshape(len(strings))
            assert got.dtype == np.uint64 and (got == want).all()

        check()
        # arrow-native inputs, including a sliced array (nonzero offset)
        arr = pa.array(["aa", "bb", "ccc", None])
        assert [int(v) for v in U.hash64_batch(arr)] == [
            U.fnv1a64(s) for s in ["aa", "bb", "ccc", ""]
        ]
        assert [int(v) for v in U.hash64_batch(arr[1:])] == [
            U.fnv1a64(s) for s in ["bb", "ccc", ""]
        ]
        chunked = pa.chunked_array([["x"], ["yy", "zzz"]])
        assert [int(v) for v in U.hash64_batch(chunked)] == [
            U.fnv1a64(s) for s in ["x", "yy", "zzz"]
        ]

    def test_minhash_similarity_monotone(self):
        t1 = "the quick brown fox jumps over the lazy dog again and again".split()
        t2 = "the quick brown fox jumps over the lazy cat again and again".split()
        t3 = "completely different words here nothing shared at all today now".split()
        s1 = H.minhash_signature(H.shingle_hashes(t1))
        s2 = H.minhash_signature(H.shingle_hashes(t2))
        s3 = H.minhash_signature(H.shingle_hashes(t3))
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > sim13
        assert (s1 == H.minhash_signature(H.shingle_hashes(t1))).all()

    def test_simhash_close_for_similar(self):
        t1 = "alpha beta gamma delta epsilon zeta".split() * 3
        t2 = (t1 + ["extra"])
        d = bin(H.simhash64(t1) ^ H.simhash64(t2)).count("1")
        assert d <= 12
        far = bin(H.simhash64(t1) ^ H.simhash64("one two three four five six".split())).count("1")
        assert far > d


class TestPageContext:
    """M16 get_context goldens (shared/webpage.py:55-65 semantics)."""

    def test_window_and_last_token_wins(self):
        from web_crawler_search_engine_ray.functions.text import page_context

        kinds = ["title", "text", "text"]
        texts = ["My Title", "alpha beta gamma", "delta epsilon"]
        # title is excluded (head); window starts at the match position
        assert page_context(kinds, texts, ["beta"]).startswith("beta gamma")
        # last matching token wins (reference loop has no break)
        out = page_context(kinds, texts, ["beta", "delta"])
        assert out.startswith("delta")
        # missing tokens leave the default
        assert page_context(kinds, texts, ["zzz"]) == ""

    def test_scripts_kept_in_context_profile(self):
        from web_crawler_search_engine_ray.functions.text import page_context

        # the reference's get_context path never decomposes script/style
        out = page_context(["script"], ["var xyzzy = 1;"], ["xyzzy"])
        assert out.startswith("xyzzy")

    def test_window_is_300_chars(self):
        from web_crawler_search_engine_ray.functions.text import page_context

        long = "needle " + "word " * 200
        out = page_context(["text"], [long], ["needle"])
        assert len(out) == 300


def test_docs_io_roundtrip(ray_session, micro_web, tmp_path):
    """docs_io gate: write_docs/read_docs round-trip the docs schema in
    whichever format is available (Lance when importable, else Parquet)."""
    from web_crawler_search_engine_ray.sources import docs_io

    path = docs_io.write_docs(micro_web["docs"], str(tmp_path))
    assert docs_io.docs_format() in ("lance", "parquet")
    back = docs_io.read_docs_table(path)
    assert back.schema.names == micro_web["docs"].schema.names
    assert back.num_rows == micro_web["docs"].num_rows
    ds = docs_io.read_docs(path, columns=["doc_id", "status"])
    assert ds.count() == micro_web["docs"].num_rows
    assert set(ds.schema().names) == {"doc_id", "status"}


class TestVectorizedUrlKernels:
    """Property-tested equality of the Arrow/numpy fast-path URL kernels
    against the scalar stdlib-parity reference implementations (VERDICT r3
    item 4: vectorize the frontier hot path, keep urllib semantics as the
    oracle)."""

    @staticmethod
    def _url_strategy():
        from hypothesis import strategies as st

        scheme = st.sampled_from(
            ["https", "http", "HTTPS", "ftp", "a+b-c.d", "1bad", "", "é"]
        )
        host = st.sampled_from(
            [
                "example.org",
                "sub.EXAMPLE.org",
                "ics.uci.edu",
                "other.com",
                "",
                "[::1]",
                "[broken",
                "host:8080",
            ]
        )
        seg = st.sampled_from(
            ["a", "b", "doku.php", "file.pdf", "x.CSS", "", "a;v=1", "a b",
             "ü", "x.tar.gz", "%2e", "file.names", "q.z"]
        )
        path = st.lists(seg, max_size=5).map(lambda s: "/".join([""] + s) if s else "")
        query = st.sampled_from(
            ["", "ok=1", "share=1", "share=", "a=1&action=2", "afg9_page_id=3",
             "myfilter=x", "%73hare=1", "a=%20", "ical", "x=1;y=2", "a b=c"]
        )
        frag = st.sampled_from(["", "frag", "?share=1"])
        junk = st.text(max_size=20)  # fully adversarial raw strings

        def build(parts):
            sch, h, p, q, f = parts
            u = ""
            if sch:
                u += sch + ":"
            u += "//" + h if h else ""
            u += p
            if q:
                u += "?" + q
            if f:
                u += "#" + f
            return u

        composed = st.tuples(scheme, host, path, query, frag).map(build)
        return st.one_of(composed, junk)

    def test_is_valid_batch_matches_scalar(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        roots = ("example.org", ".edu")

        @settings(max_examples=120, deadline=None)
        @given(st.lists(self._url_strategy(), max_size=30))
        def check(urls):
            try:
                want = np.array([U.is_valid(u, roots) for u in urls], bool)
            except ValueError:
                return  # stdlib raises (IPv6 bracket) — raise-parity below
            got = U.is_valid_batch(urls, roots)
            assert got.dtype == bool and got.shape == (len(urls),)
            assert (got == want.reshape(len(urls))).all()

        check()

    def test_host_batch_matches_scalar(self):
        from urllib.parse import urlparse

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=120, deadline=None)
        @given(st.lists(self._url_strategy(), max_size=30))
        def check(urls):
            try:
                want = [urlparse(u).netloc for u in urls]
            except ValueError:
                return
            assert U.host_batch(urls) == want

        check()

    def test_normalize_batch_matches_scalar(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=120, deadline=None)
        @given(st.lists(st.one_of(self._url_strategy(), st.text(max_size=30)), max_size=30))
        def check(urls):
            assert U.normalize_batch(urls) == [U.normalize(u) for u in urls]

        check()

    def test_bracket_url_raise_parity(self):
        """Unbalanced-IPv6-bracket URLs raise in stdlib urlparse; the batch
        kernels route them to the stdlib fallback, so they raise too."""
        import pytest as _pytest

        bad = "https://[broken/x"
        with _pytest.raises(ValueError):
            U.is_valid(bad, ("example.org",))
        with _pytest.raises(ValueError):
            U.is_valid_batch([bad], ("example.org",))
        with _pytest.raises(ValueError):
            U.host_batch([bad])
