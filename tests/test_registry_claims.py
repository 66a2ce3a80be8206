"""SURVEY-claims vs query-registry cross-check.

Round 9's verdict found that commit 963e5d3 deleted the registered
query ``x_check_constraints`` by accident (its @register block was
adjacent to the intended removal) while SURVEY.md and README.md kept
claiming it as hash-checked.  The registry-iterating tests could not
catch it — an entry that no longer exists is simply not iterated.

This module closes that hole in both directions:

* every backticked query-shaped name claimed in SURVEY §2.0 must
  exist in ``queries.all_queries()`` (a deleted query orphans its
  SURVEY claim → fail);
* every registered query must be mentioned in SURVEY.md — by full
  backticked name, by a declared range shorthand (`` `q1`–`q22` ``,
  `` `r1`..`r11` ``), or by a trailing-``*`` glob (`` `meta_*` ``) —
  so new queries cannot ship without a coverage-map row;
* the literal "N registered queries" counts in SURVEY.md/README.md
  must equal the live registry size.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Registered names are family-prefixed: r1_, q22_, s123_, c4c5_, k67_,
# or a bare family letter (x_, d_, a_, m_, t_, e_, p_, c_, s_, meta_).
_QUERY_SHAPE = re.compile(
    r"^(q\d+|r\d+[a-z]?|s\d+|c\d+[a-z0-9]*|k\d+|[acdemptsx]|meta)_[a-z0-9_]+$"
)


def _registry() -> set[str]:
    from cube_builder_spark.queries import all_queries

    return set(all_queries())


def _survey_text() -> str:
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        return fh.read()


def _backticked(text: str) -> set[str]:
    # Strip ``double-backtick`` spans first: an odd mix of `` and `
    # on one line mis-pairs a naive single-backtick scan.
    clean = re.sub(r"``[^`\n]*``", " ", text)
    return set(re.findall(r"`([^`\n]+)`", clean))


def test_survey_s20_claims_exist_in_registry():
    """Forward: SURVEY §2.0 may not claim a query that is not registered."""
    text = _survey_text()
    m = re.search(r"### 2\.0(.*?)### 2\.1", text, re.S)
    assert m, "SURVEY.md lost its §2.0 section"
    claimed = {
        t for t in _backticked(m.group(1)) if _QUERY_SHAPE.fullmatch(t)
    }
    assert len(claimed) > 150, "suspiciously few claims parsed from §2.0"
    dangling = sorted(claimed - _registry())
    assert not dangling, (
        "SURVEY §2.0 claims queries that are NOT in the registry "
        f"(deleted without updating the coverage map?): {dangling}"
    )


def test_every_registered_query_has_a_survey_mention():
    """Inverse: a registered query must appear somewhere in SURVEY.md."""
    text = _survey_text()
    ticks = _backticked(text)
    prefixes = {t for t in ticks if re.fullmatch(r"[a-z]+\d+[a-z0-9]*", t)}
    for m in re.finditer(
        r"`([qr])(\d+)`\s*(?:–|—|\.\.\.?|-)\s*`\1(\d+)`", text
    ):
        fam, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
        prefixes.update(f"{fam}{i}" for i in range(lo, hi + 1))
    globs = [t[:-1] for t in ticks if t.endswith("*")]

    def covered(name: str) -> bool:
        if name in ticks:
            return True
        if name.split("_")[0] in prefixes:
            return True
        return any(name.startswith(g) for g in globs)

    missing = sorted(n for n in _registry() if not covered(n))
    assert not missing, (
        "registered queries with no SURVEY.md mention "
        f"(add a §2.0 row): {missing}"
    )


def test_claimed_registry_counts_match():
    """The literal 'N registered queries' claims must track the registry."""
    n = len(_registry())
    for fname in ("SURVEY.md", "README.md"):
        with open(os.path.join(REPO, fname)) as fh:
            text = fh.read()
        # \s+ — a line break between the number and the phrase must
        # not let a stale count evade the guard (round-10 review)
        for m in re.finditer(r"(\d+)\s+registered queries", text):
            assert int(m.group(1)) == n, (
                f"{fname} claims {m.group(1)} registered queries; "
                f"registry has {n}"
            )


def test_claimed_oracle_count_matches():
    from cube_builder_spark.queries import all_oracles

    n_oracles = len(all_oracles())
    text = _survey_text()
    m = re.search(r"\((\d+) of\s+(\d+);", text)
    assert m, "SURVEY.md lost its oracle-count sentence"
    assert int(m.group(1)) == n_oracles
    assert int(m.group(2)) == len(_registry())
