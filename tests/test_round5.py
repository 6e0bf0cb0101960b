"""Round-5 regression gates.

Registry capacity policy (round-4 verdict #8): the driver records a
CORRECTNESS row per `queries()` key in a 50-entry window that is now
EXACTLY full. An accidental 51st key would silently drop the tail from
the correctness record — new operators must merge into an existing
tagged-UNION entry instead. This suite makes that policy a loud test
failure rather than a silent reporting gap.
"""

import __spark_entry__ as entrymod

REGISTRY_CAP = 50


def test_registry_exactly_at_cap():
    qs = entrymod.queries()
    assert len(qs) == REGISTRY_CAP, (
        f"queries() holds {len(qs)} entries; the driver records exactly "
        f"{REGISTRY_CAP} — merge new operators into a tagged-UNION entry "
        "instead of adding a key (round-4 verdict #8)")


def test_every_oracle_key_is_a_query_key():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    stray = set(oracles) - set(qs)
    assert not stray, f"oracle_sql keys without queries(): {sorted(stray)}"


def test_rows_only_queries_are_the_documented_two():
    """Every queries() entry except the two documented rows-only ones
    must carry an oracle — a silently oracle-less entry downgrades its
    correctness row to rows-only without the judge seeing why."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"compression_codecs", "media_entropy"}, rows_only
