"""Golden end-to-end matcher tests, ported from the reference suites:

- fuzzy_search_cases.json  (exact/typo/no-match with score bands)
- edge_case_tests.json     (short names, max typos, common names)
- nickname_tests.json      (prefix-completion semantics)
- ocr_multichar_test.go    (OCR confusion scenarios)
- remove_entries_test_data.json (delete lifecycle)
- basic_tests.json         (2-member roster, empty matcher)

Each case: (firstname, surname, birthdate, should_find, member_id,
min_score, max_score).
"""

import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import (
    CoreParams,
    FieldParams,
    MatchConfig,
    example_member_config,
)
from fuzzy_matcher_spark.operators.matcher import remove_entries, search
from fuzzy_matcher_spark.sources.members import (
    BASIC_MEMBERS,
    MEMBERS,
    REMOVAL_MEMBERS,
    members_df,
    probe_validity_col,
    probes_df,
)

CFG = example_member_config()

FUZZY_CASES = [
    # fuzzy_search_cases.json
    ("John", "Smith", "1990-05-15", True, 1, 0.95, 1.0),
    ("Jon", "Smith", "1990-05-15", True, 1, 0.85, 0.99),
    ("Micheal", "Brown", "1992-08-22", True, 3, 0.85, 1.0),
    ("Sara", "Jhonson", "1985-12-03", True, 2, 0.75, 1.0),
    ("Xyz", "Nonexistent", "2000-01-01", False, None, None, None),
    ("John", "Smith", "1985-01-01", False, None, None, None),
    ("Ema", "Davis", "1988-03-10", True, 4, 0.85, 1.0),
    ("Jmes", "Wilson", "1995-01-18", True, 5, 0.75, 1.0),
    # edge_case_tests.json
    ("Janes", "Wilson", "1995-01-18", True, 5, 0.7, 1.0),
    ("Al", "Li", "1988-01-01", False, None, None, None),
    ("Jahn", "Smythe", "1990-05-15", False, None, None, None),
    ("John", "Johnson", "1990-01-01", False, None, None, None),
]

NICKNAME_CASES = [
    ("Ben", "Anderson", "1989-09-14", True, 9, 0.6, 1.0),
    ("Mike", "Brown", "1992-08-22", True, 3, 0.6, 1.0),
    ("Liz", "Smith", "1990-05-15", False, None, None, None),
    ("Bill", "Moore", "1987-11-08", True, 7, 0.6, 1.0),
    ("Alex", "Jackson", "1986-02-28", True, 11, 0.6, 1.0),
    ("Chris", "Walker", "1987-04-02", True, 19, 0.6, 1.0),
    ("Matt", "Lewis", "1995-05-23", True, 17, 0.6, 1.0),
    ("Dan", "Garcia", "1988-08-07", True, 15, 0.6, 1.0),
    ("Michael", "Brown", "1992-08-22", True, 3, 0.95, 1.0),
    ("Bob", "Johnson", "1985-12-03", False, None, None, None),
]


def _run_cases(spark, cases, rows=None, cfg=CFG):
    base = members_df(spark, cfg, rows)
    probes = probes_df(
        spark,
        [(i, c[0], c[1], c[2]) for i, c in enumerate(cases)],
    )
    result = search(
        base, probes, cfg, is_valid_col=probe_validity_col()
    ).collect()
    by_probe = {}
    for r in result:
        by_probe.setdefault(r.probe_id, []).append(r)
    return by_probe


def _check(cases, by_probe):
    for i, (fn, sn, bd, should, mid, lo, hi) in enumerate(cases):
        got = by_probe.get(i, [])
        if not should:
            assert not got, f"{fn} {sn}: expected no match, got {got}"
            continue
        assert got, f"{fn} {sn}: expected a match, got none"
        hits = {r.id: r.score for r in got}
        assert mid in hits, f"{fn} {sn}: expected member {mid} in {hits}"
        s = hits[mid]
        assert lo <= s <= hi, f"{fn} {sn}: score {s} outside [{lo},{hi}]"


def test_fuzzy_search_cases(spark):
    _check(FUZZY_CASES, _run_cases(spark, FUZZY_CASES))


def test_nickname_cases(spark):
    _check(NICKNAME_CASES, _run_cases(spark, NICKNAME_CASES))


def test_top5_and_rank(spark):
    """No more than top_k results per probe, ranked by score desc."""
    cases = [("John", "Smith", "1990-05-15", True, 1, 0.95, 1.0)]
    by_probe = _run_cases(spark, cases)
    for rows in by_probe.values():
        assert len(rows) <= CFG.top_k
        scores = [r.score for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)


def test_basic_roster(spark):
    cases = [
        ("John", "Smith", "1990-05-15", True, 1, 0.8, 1.0),
        ("Jon", "Smyth", "1990-05-15", True, 1, 0.3, 1.0),
    ]
    _check(cases, _run_cases(spark, cases, rows=BASIC_MEMBERS))


def test_empty_matcher(spark):
    """Search against an empty roster returns nothing
    (distance_calculator_test.go:618-641)."""
    by_probe = _run_cases(spark, [("John", "Smith", "1990-05-15", False, None, None, None)],
                          rows=[])
    assert not by_probe


def test_removal_lifecycle(spark):
    """remove_entries_test_data.json script, condensed."""
    cfg = CFG
    base = members_df(spark, cfg, REMOVAL_MEMBERS)
    probes = probes_df(
        spark,
        [
            (0, "John", "Smith", "1990-05-15"),
            (1, "John", "Williams", "1985-12-03"),
            (2, "Jon", "Smyth", "1990-05-15"),
            (3, "John", "Willams", "1985-12-03"),
        ],
    )

    def hits(b):
        res = search(b, probes, cfg, is_valid_col=probe_validity_col()).collect()
        out = {}
        for r in res:
            out.setdefault(r.probe_id, {})[r.id] = r.score
        return out

    # initial: both findable
    h = hits(base)
    assert 1 in h[0] and 2 in h[1]

    # remove John Smith -> he disappears, Williams remains
    ids = spark.createDataFrame([(1,)], "id long")
    base2 = remove_entries(base, ids)
    h = hits(base2)
    assert 1 not in h.get(0, {}), "removed entry still found"
    assert 2 in h[1] and h[1][2] >= 0.8
    assert 1 not in h.get(2, {})
    assert 2 in h.get(3, {}) and 0.3 <= h[3][2] <= 1.0

    # bulk removal -> nothing found
    base3 = remove_entries(base, spark.createDataFrame([(1,), (2,)], "id long"))
    assert not hits(base3)


OCR_CFG = MatchConfig(
    fields={
        "firstname": FieldParams(6, 6, 0.2, "jaro", 0.7),
        "surname": FieldParams(2, 2, 0.4, "jaro", 0.9),
        "birthdate": FieldParams(2, 2, 0.4, "default", 1.0),
    },
    core=CoreParams(correct_ocr_misreads=True, max_edits=10),
)


@pytest.mark.parametrize(
    "query_first,target_first,ocr_on,expect",
    [
        ("srnith", "smith", True, True),
        ("srnithsrnithsrnithsrnithsrnith", "smithsmithsmithsmithsmith", True, True),
        # OCR off: 10 positional edits > per-field budget 6 -> no match
        ("srnithsrnithsrnithsrnithsrnith", "smithsmithsmithsmithsmith", False, False),
        ("jonnson", "jomson", True, True),
        ("clown", "down", True, True),
        ("dovvn", "down", True, True),
        ("jonnath4n", "jonathan", True, True),
    ],
)
def test_ocr_scenarios(spark, query_first, target_first, ocr_on, expect):
    cfg = OCR_CFG if ocr_on else MatchConfig(
        fields=OCR_CFG.fields, core=CoreParams(False, 10)
    )
    base = members_df(spark, cfg, [(1, target_first, "Test", "1990-01-01")])
    probes = probes_df(spark, [(0, query_first, "Test", "1990-01-01")])
    res = search(base, probes, cfg, is_valid_col=probe_validity_col()).collect()
    found = any(r.id == 1 for r in res)
    assert found == expect, (query_first, target_first, ocr_on, res)


def test_max_depth_is_second_edit_cap(spark):
    """Depth == NumEdits in the reference walk (recurse.go:91-161,
    breadth_first_search.go:67-73 pair every DepthIncrement=1 with
    NumEditsIncrement=1), so the effective per-field budget is
    min(max_edits, max_depth): a 2-edit match survives max_depth=6
    and dies at max_depth=1."""

    def cfg_with_depth(d):
        return MatchConfig(
            fields={
                "firstname": FieldParams(d, 6, 0.5, "jaro", 0.7),
                "surname": FieldParams(6, 6, 0.5, "jaro", 0.7),
            },
            core=CoreParams(max_edits=6),
        )

    for depth, expect in [(6, True), (1, False)]:
        cfg = cfg_with_depth(depth)
        base = members_df(spark, cfg)
        probes = probes_df(
            spark, [(0, "Christxphxr", "Walker", "1987-04-02")], cfg
        )
        res = search(
            base, probes, cfg, is_valid_col=probe_validity_col()
        ).collect()
        found = any(r.id == 19 for r in res)
        assert found == expect, (depth, res)


def test_free_completion_is_depth_free(spark):
    """Completions beyond the query end cost neither edits nor depth
    (breadth_first_search.go:62-73: the 1/1 increments only apply while
    Index-1 < len(Word)), so 'Chris' -> 'christopher' (6 extra chars)
    still matches at max_depth = max_edits = 0 — max_depth is NOT a
    completion-length cap."""
    cfg = MatchConfig(
        fields={
            "firstname": FieldParams(0, 0, 0.5, "jaro", 0.7),
            "surname": FieldParams(0, 0, 0.5, "jaro", 0.7),
        },
        core=CoreParams(max_edits=6),
    )
    base = members_df(spark, cfg)
    probes = probes_df(spark, [(0, "Chris", "Walker", "1987-04-02")], cfg)
    res = search(base, probes, cfg, is_valid_col=probe_validity_col()).collect()
    assert any(r.id == 19 for r in res), res


def test_empty_required_field_rejects(spark):
    """matchVal == '' with min_distance > 0 rejects the entry
    (fuzzy_matcher_core.go:231) even though the default/levenshtein
    kernels score empty-vs-empty as 1.0."""
    cfg = MatchConfig(
        fields={
            "firstname": FieldParams(6, 6, 0.4, "jaro", 0.7),
            "surname": FieldParams(2, 2, 0.3, "jaro", 0.9),
            "birthdate": FieldParams(2, 2, 0.3, "default", 1.0),
        },
        core=CoreParams(max_edits=6),
    )
    # None birthdate: extraction's to_date(None) -> null, which prepare
    # coalesces to the reference's empty-string semantics
    base = members_df(spark, cfg, [(1, "John", "Smith", None)])
    probes = probes_df(spark, [(0, "John", "Smith", None)], cfg)
    res = search(base, probes, cfg, is_valid_col=probe_validity_col()).collect()
    assert not res, res

    # control: non-empty birthdates on both sides still match
    base2 = members_df(spark, cfg, [(1, "John", "Smith", "1990-05-15")])
    probes2 = probes_df(spark, [(0, "John", "Smith", "1990-05-15")], cfg)
    res2 = search(
        base2, probes2, cfg, is_valid_col=probe_validity_col()
    ).collect()
    assert any(r.id == 1 for r in res2), res2


def test_search_profiles_per_record_parameters(spark):
    """Per-record parameter switching (fuzzy_types/types.go:102-105):
    probes in the 'strict' profile use a tight surname threshold that
    rejects a typo the 'loose' profile accepts."""
    from fuzzy_matcher_spark.operators.matcher import search_profiles
    from fuzzy_matcher_spark.sources.members import extraction_exprs
    from fuzzy_matcher_spark.operators.matcher import prepare

    loose = MatchConfig(
        fields={
            "firstname": FieldParams(6, 6, 0.5, "jaro", 0.7),
            "surname": FieldParams(6, 6, 0.5, "jaro", 0.7),
        },
        core=CoreParams(max_edits=6),
    )
    strict = MatchConfig(
        fields={
            "firstname": FieldParams(6, 6, 0.5, "jaro", 0.7),
            "surname": FieldParams(6, 6, 0.5, "jaro", 0.97),
        },
        core=CoreParams(max_edits=6),
    )
    base = members_df(spark, loose)
    raw = spark.createDataFrame(
        [
            (0, "John", "Smitt", "1990-05-15", "loose"),
            (1, "John", "Smitt", "1990-05-15", "strict"),
            (2, "John", "Smitt", "1990-05-15", "unknown"),
        ],
        "probe_id long, firstname string, surname string,"
        " birthdate string, profile string",
    )
    probes = prepare(raw, loose, extraction_exprs())
    got = search_profiles(base, probes, {"loose": loose, "strict": strict})
    by_probe = {}
    for r in got.collect():
        by_probe.setdefault(r.probe_id, []).append(r.id)
    assert 1 in by_probe.get(0, [])  # loose accepts the surname typo
    assert 1 not in by_probe.get(1, [])  # strict threshold rejects it
    assert 2 not in by_probe  # unknown profile -> no parameters -> no rows
