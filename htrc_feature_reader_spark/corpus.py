"""Corpus / Volume facade: the reference's user-facing API, corpus-wide.

The reference exposes ``FeatureReader(ids).volumes()`` -> ``Volume`` with
methods like ``tokenlist(**flags)``, ``tokens()``, ``tokens_per_page()``,
``term_volume_freqs()``, ``term_page_freqs()``, ``line_chars()``,
``section_features()`` and per-page ``Page`` proxies
(/root/reference/htrc_features/feature_reader.py:206-928). This facade
keeps those names and flag semantics, but every method returns a lazy
DataFrame over the whole corpus — ``volume(htid)`` is a pushdown filter,
not an object loaded into memory, so "iterate volumes and compute" becomes
"one Catalyst plan over all volumes".

A reference user ports like this:

    fr = FeatureReader(paths)                 ->  c = Corpus.from_ef_json(spark, paths)
    vol = next(fr.volumes())                  ->  v = c.volume(htid)
    vol.tokenlist(case=False, pos=False)      ->  v.tokenlist(case=False, pos=False)
    vol.tokens(min_count=5)                   ->  v.tokens(min_count=5)
    vol.tokenlist(chunk=True, chunk_target=N) ->  v.tokenlist(chunk=True, chunk_target=N)
    vol.save(dir, format='parquet')           ->  c.save_parquet(dir, token_kwargs=...)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import MissingDataError
from .operators import (
    distinct_tokens,
    fold_linechars,
    fold_section_features,
    fold_tokenlist,
    term_page_freqs,
    term_volume_freqs,
    tokens_per_page,
)
from .operators.chunking import chunked_tokenlist
from .sources import ef_json, parquet_quad


class Corpus:
    """Lazy corpus-wide view over the four feature tables."""

    def __init__(
        self,
        tokens: DataFrame | None = None,
        section_features: DataFrame | None = None,
        line_chars: DataFrame | None = None,
        volumes: DataFrame | None = None,
        default_section: str = "body",
        doc_col: str = "htid",
    ):
        self._tokens = tokens
        self._sections = section_features
        self._chars = line_chars
        self._volumes = volumes
        self.default_section = default_section
        self.doc_col = doc_col

    # ---- constructors ----------------------------------------------------
    @classmethod
    def from_ef_json(cls, spark: SparkSession, paths, multiline: bool = True) -> "Corpus":
        """Build all four tables from EF-JSON volume files (one scan)."""
        raw = ef_json.read_ef_json(spark, paths, multiline=multiline)
        return cls(
            tokens=ef_json.tokenlist_from_ef(raw),
            section_features=ef_json.section_features_from_ef(raw),
            line_chars=ef_json.line_chars_from_ef(raw),
            volumes=ef_json.volumes_from_ef(raw),
        )

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str) -> "Corpus":
        """Open a quad-layout parquet corpus; missing parts stay None
        (partial stores are first-class, parsers.py:560-586)."""
        def maybe(part):
            try:
                return parquet_quad.read_quad(spark, path, part)
            except MissingDataError:
                return None

        return cls(
            tokens=maybe(parquet_quad.TOKENS),
            section_features=maybe(parquet_quad.SECTION),
            line_chars=maybe(parquet_quad.CHARS),
            volumes=maybe(parquet_quad.META),
        )

    # ---- table access ------------------------------------------------------
    def _need(self, df: DataFrame | None, what: str) -> DataFrame:
        if df is None:
            raise MissingDataError(f"this corpus has no {what} table")
        return df

    @property
    def metadata(self) -> DataFrame:
        return self._need(self._volumes, "volume metadata")

    def ids(self) -> DataFrame:
        src = self._volumes if self._volumes is not None else self._tokens
        return self._need(src, "any").select(self.doc_col).distinct()

    # ---- the reference API, corpus-wide ------------------------------------
    def tokenlist(
        self,
        pages: bool = True,
        section: str = "default",
        case: bool = True,
        pos: bool = True,
        page_freq: bool = False,
        page_select: int | None = None,
        drop_section: bool = False,
        chunk: bool = False,
        chunk_target: int = 10_000,
        overflow_strategy: str = "ends",
        page_ref: bool = False,
    ) -> DataFrame:
        tl = self._need(self._tokens, "tokenlist")
        section = self._section(section, tl)
        if chunk:
            return chunked_tokenlist(
                tl, chunk_target=chunk_target, overflow_strategy=overflow_strategy,
                page_ref=page_ref, doc_col=self.doc_col,
                section=section, case=case, pos=pos, page_freq=page_freq,
                drop_section=drop_section,
            )
        return fold_tokenlist(
            tl, pages=pages, section=section, case=case, pos=pos,
            page_freq=page_freq, page_select=page_select,
            drop_section=drop_section, doc_col=self.doc_col,
        )

    def tokens(self, case: bool = True, min_count: int = 1) -> DataFrame:
        return distinct_tokens(
            self._need(self._tokens, "tokenlist"), case=case,
            min_count=min_count, doc_col=self.doc_col,
        )

    def _section(self, section: str, df: DataFrame | None = None) -> str:
        """'default' inherits default_page_section ('body'), exactly like
        the reference (feature_reader.py:349,491,686,814) — unless the
        backing table has no section column (partial schemas), where the
        inherited default degrades to a cross-section fold. Explicit slice
        requests are passed through untouched (the operators raise loudly
        if the level is missing)."""
        if section != "default":
            return section
        if df is not None and "section" not in df.columns:
            return "group"
        return self.default_section

    def tokens_per_page(self, section: str = "default") -> DataFrame:
        tl = self._need(self._tokens, "tokenlist")
        return tokens_per_page(
            tl, section_features=self._sections, doc_col=self.doc_col,
            section=self._section(section, self._sections if self._sections is not None else tl),
        )

    def term_volume_freqs(self, page_freq: bool = True, pos: bool = True,
                          case: bool = True,
                          section: str = "default") -> DataFrame:
        tl = self._need(self._tokens, "tokenlist")
        return term_volume_freqs(
            tl, page_freq=page_freq, pos=pos, case=case, doc_col=self.doc_col,
            section=self._section(section, tl),
        )

    def term_page_freqs(self, page_freq: bool = True, case: bool = True,
                        token_values: list[str] | None = None,
                        section: str = "default") -> DataFrame:
        tl = self._need(self._tokens, "tokenlist")
        return term_page_freqs(
            tl, page_freq=page_freq, case=case, doc_col=self.doc_col,
            token_values=token_values, section=self._section(section, tl),
        )

    def section_features(self, section: str = "default", feature: str | None = None,
                         page_select: int | None = None) -> DataFrame:
        return fold_section_features(
            self._need(self._sections, "section features"),
            section=self._section(section, self._need(self._sections, "section features")),
            feature=feature, page_select=page_select, doc_col=self.doc_col,
        )

    def line_chars(self, section: str = "default", place: str = "all") -> DataFrame:
        return fold_linechars(
            self._need(self._chars, "line chars"),
            section=self._section(section, self._need(self._chars, "line chars")),
            place=place, doc_col=self.doc_col,
        )

    def begin_line_chars(self, section: str = "default") -> DataFrame:
        return self.line_chars(section=section, place="begin")

    def end_line_chars(self, section: str = "default") -> DataFrame:
        return self.line_chars(section=section, place="end")

    # reference convenience wrappers (feature_reader.py:588-613)
    def line_counts(self, **kw) -> DataFrame:
        return self.section_features(feature="lineCount", **kw)

    def empty_line_counts(self, **kw) -> DataFrame:
        return self.section_features(feature="emptyLineCount", **kw)

    def sentence_counts(self, **kw) -> DataFrame:
        return self.section_features(feature="sentenceCount", **kw)

    def cap_alpha_seqs(self, **kw) -> DataFrame:
        kw.setdefault("section", "body")  # body-only, as the reference warns
        return self.section_features(feature="capAlphaSeq", **kw)

    # ---- navigation ----------------------------------------------------
    def volume(self, htid: str) -> "Corpus":
        """One volume as a pushdown-filtered view (the reference's Volume)."""
        def flt(df):
            return None if df is None else df.filter(F.col(self.doc_col) == htid)

        return Corpus(
            tokens=flt(self._tokens), section_features=flt(self._sections),
            line_chars=flt(self._chars), volumes=flt(self._volumes),
            default_section=self.default_section, doc_col=self.doc_col,
        )

    def page(self, htid: str, seq: int) -> DataFrame:
        """The reference's Page proxy: tokenlist restricted to one page."""
        return self.volume(htid).tokenlist(page_select=seq, section="all")

    # ---- sinks ----------------------------------------------------------
    def save_parquet(self, path: str, **write_kwargs) -> None:
        parquet_quad.write_quad(
            path, tokenlist=self._tokens, line_chars=self._chars,
            section_features=self._sections, volumes=self._volumes,
            **write_kwargs,
        )

    def save_ef_json(self, path: str, **kw) -> None:
        from .sources.ef_json_sink import write_ef_json

        write_ef_json(path, self._need(self._tokens, "tokenlist"),
                      section_features=self._sections, line_chars=self._chars,
                      volumes=self._volumes, **kw)
