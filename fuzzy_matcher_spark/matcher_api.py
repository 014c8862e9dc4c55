"""Public facade — API parity with the reference's FuzzyMatcher
(/root/reference/fuzzy_matcher.go:16-36: Init, InsertEntries, Search,
RemoveEntries), DataFrame-native and optionally TableIO-persistent.

A reference user maps their calls 1:1:

    m = FuzzyMatcher(config, spark)                 # Init
    m.insert_entries(df, extraction={...})          # InsertEntries/Build
    hits = m.search(probe_df, is_valid_col=...)     # Search (Clean+SearchFuzzy)
    m.remove_entries(ids_df)                        # RemoveEntries

Incremental insert visibility is immediate (the reference builds into
a live trie, fuzzy_matcher_core.go:59-106; here inserts union into the
base relation / append a TableIO snapshot). Expiry cleanup is a
read-time predicate applied at search, matching the lazy Clean()
semantics (clean.go:29-51).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import MatchConfig
from fuzzy_matcher_spark.operators.matcher import prepare, remove_entries, search
from fuzzy_matcher_spark.sources.tableio import TableIO

BASE_TABLE = "matcher_base"

# After this many incremental insert_entries calls the base relation's
# lineage is truncated with a lazy localCheckpoint. The reference
# matcher's Build is re-entrant into a live trie
# (fuzzy_matcher_core.go:59-106) and callers use it for long-lived
# incremental ingest; a plain unionByName chain grows the logical plan
# by one Union per insert, so thousands of inserts build a plan tower
# whose analysis/optimization cost dominates every later search (and
# eventually overflows the driver stack). Checkpointing every N keeps
# plan depth <= N Unions over a LogicalRDD root. Lazy (eager=False):
# the truncation materializes on the next action, so insert itself
# stays cheap — matching the reference's O(insert) cost shape.
CHECKPOINT_EVERY = 32


class FuzzyMatcher:
    def __init__(
        self,
        config: MatchConfig,
        spark: SparkSession,
        io: TableIO | None = None,
        id_col: str = "id",
    ):
        config.validate()
        self.config = config
        self.spark = spark
        self.io = io
        self.id_col = id_col
        self._base: DataFrame | None = None
        self._inserts_since_checkpoint = 0
        if io is not None and io.exists(BASE_TABLE):
            self._base = io.read(BASE_TABLE)

    # -- load path (O2/O13) --------------------------------------------------
    def insert_entries(
        self, df: DataFrame, extraction: dict[str, Column] | None = None
    ) -> "FuzzyMatcher":
        """No-op on empty input (fuzzy_matcher.go:21-23); re-entrant
        append otherwise. Expiry column (if configured) must be present
        (Build errors on missing expiry, fuzzy_matcher_core.go:86-88)."""
        if df.isEmpty():
            return self
        if self.config.core.use_expiration and "expiry" not in df.columns:
            raise ValueError(
                "use_expiration=True: entries must carry an 'expiry' column"
            )
        prepared = prepare(df, self.config, extraction)
        if self._base is None:
            self._base = prepared
        else:
            self._base = self._base.unionByName(prepared, allowMissingColumns=True)
            self._inserts_since_checkpoint += 1
            if self._inserts_since_checkpoint >= CHECKPOINT_EVERY:
                # bound the union tower (see CHECKPOINT_EVERY)
                self._base = self._base.localCheckpoint(eager=False)
                self._inserts_since_checkpoint = 0
        if self.io is not None:
            self.io.write(prepared, BASE_TABLE, mode="append")
        return self

    # -- probe path (O4/O13) ---------------------------------------------------
    def search(
        self,
        probes: DataFrame,
        probe_id_col: str = "probe_id",
        extraction: dict[str, Column] | None = None,
        is_valid_col: Column | None = None,
        as_of: Column | None = None,
    ) -> DataFrame:
        if self._base is None:
            return self.spark.createDataFrame(
                [], f"{probe_id_col} long, {self.id_col} long, score double, rank int"
            )
        prepared = prepare(probes, self.config, extraction)
        return search(
            self._base,
            prepared,
            self.config,
            id_col=self.id_col,
            probe_id_col=probe_id_col,
            is_valid_col=is_valid_col,
            as_of=as_of if as_of is not None else F.current_timestamp(),
        )

    def search_with_profiles(
        self,
        probes: DataFrame,
        profiles: dict,
        profile_col: str = "profile",
        probe_id_col: str = "probe_id",
        extraction: dict[str, Column] | None = None,
    ) -> DataFrame:
        """Per-record parameter switching: GetSearchParameters may
        return any parameter set per record (fuzzy_types/types.go:
        102-105). ``profiles`` maps profile name -> MatchConfig; the
        probe's ``profile_col`` selects its parameters. Probes are
        prepared with this matcher's config (the field universe)."""
        from fuzzy_matcher_spark.operators.matcher import search_profiles

        if self._base is None:
            return self.spark.createDataFrame(
                [], f"{probe_id_col} long, {self.id_col} long, score double, rank int"
            )
        prepared = prepare(probes, self.config, extraction)
        return search_profiles(
            self._base,
            prepared,
            profiles,
            profile_col=profile_col,
            id_col=self.id_col,
            probe_id_col=probe_id_col,
        )

    # -- delete path (O12) ------------------------------------------------------
    def remove_entries(self, ids: DataFrame) -> "FuzzyMatcher":
        """Bulk remove (RemoveEntries, fuzzy_matcher_core/clean.go:93-134).
        Both the in-memory and the persisted path are anti-join shaped —
        the id set stays a DataFrame end to end, so a 10M-row delete
        set never lands on the driver."""
        if self._base is None:
            return self
        self._base = remove_entries(self._base, ids, self.id_col)
        if self.io is not None:
            self.io.delete_matching(BASE_TABLE, ids, self.id_col)
        return self

    # -- maintenance (O11) -------------------------------------------------------
    def clean_expired(self, as_of: Column | None = None) -> "FuzzyMatcher":
        """Eager TTL maintenance (the reference cleans lazily per search;
        search() here already filters at read time — this physically
        removes expired rows, like Iceberg DELETE WHERE)."""
        if self._base is not None and self.config.core.use_expiration:
            cut = as_of if as_of is not None else F.current_timestamp()
            self._base = self._base.where(F.col("expiry") > cut)
            if self.io is not None:
                self.io.write(self._base, BASE_TABLE, mode="overwrite")
        return self
