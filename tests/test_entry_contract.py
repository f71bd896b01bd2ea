"""Driver-contract invariants on __spark_entry__ (round-4 ADVICE):
the external correctness sweep runs at most 50 queries per round, so
any growth of the registry past 50 silently removes a query from
independent cross-engine verification.  Pin the size and the
queries/oracles relationship so a violation fails loudly."""

import __spark_entry__ as entrymod

# The driver's observed per-round sweep cap (r3 and r4 both recorded
# exactly 50 rows against a 51-entry registry).
DRIVER_SWEEP_CAP = 50


def test_registry_fits_driver_sweep():
    qs = entrymod.queries()
    assert len(qs) <= DRIVER_SWEEP_CAP, (
        f"{len(qs)} registered queries > driver sweep cap "
        f"{DRIVER_SWEEP_CAP}: the overflow entries get NO external "
        "correctness row. Merge or retire a redundant query instead."
    )


def test_every_oracle_has_a_query():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, f"oracles without a query: {sorted(os_ - qs)}"


def test_queries_without_oracle_are_known():
    """Every query should carry an oracle; exceptions must be listed
    here deliberately (the driver records a weaker rows-only check for
    them and the judge sees which)."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs - os_ == set(), (
        f"queries with no oracle entry: {sorted(qs - os_)}"
    )
