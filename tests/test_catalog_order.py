"""Catalog iteration order drives the round driver's 50-query
correctness window: never-driver-checked entries must come first."""

from __future__ import annotations

from dsp_spark import catalog


def test_never_checked_entries_lead(monkeypatch):
    names = list(catalog.entries())
    some_checked = {n: 2 for n in names[10:]}  # pretend the tail is checked
    monkeypatch.setattr(catalog, "_driver_checked_rounds", lambda: some_checked)
    ordered = list(catalog.entries())
    assert ordered[:10] == names[:10] or set(ordered[:10]) == set(names[:10])
    # every unchecked entry precedes every checked one
    pos = {n: i for i, n in enumerate(ordered)}
    assert max(pos[n] for n in names[:10]) < min(pos[n] for n in some_checked)


def test_checked_entries_ordered_oldest_round_first(monkeypatch):
    names = list(catalog.entries())
    rounds = {n: (1 if i % 2 else 3) for i, n in enumerate(names)}
    monkeypatch.setattr(catalog, "_driver_checked_rounds", lambda: rounds)
    ordered = list(catalog.entries())
    seen_r3 = False
    for n in ordered:
        if n in catalog._CHANGED_IN_ROUND:
            continue  # forced re-checks intentionally jump the queue
        if rounds[n] == 3:
            seen_r3 = True
        else:
            assert not seen_r3, "round-1-checked entry after a round-3 one"
    # the override must not mutate the source dict
    assert all(n in rounds for n in catalog._CHANGED_IN_ROUND)


def test_changed_entries_rotate_to_front_until_rechecked(monkeypatch):
    """_CHANGED_IN_ROUND: an entry whose implementation changed after
    its newest green driver row sorts as never-checked; once a round
    >= the change lands in the artifacts, it ages normally again."""
    forced = dict(catalog._CHANGED_IN_ROUND)
    if not forced:
        return  # nothing currently forced; mechanism covered when used
    name, rnd = next(iter(forced.items()))
    names = list(catalog.entries())
    # stale green row (rnd - 1): must jump to the never-checked front
    monkeypatch.setattr(
        catalog, "_driver_checked_rounds", lambda: {n: rnd - 1 for n in names}
    )
    assert list(catalog.entries()).index(name) < len(forced) + 1
    # fresh green row (rnd): override is a no-op, entry ages normally
    fresh = {n: rnd - 1 for n in names}
    fresh[name] = rnd
    monkeypatch.setattr(catalog, "_driver_checked_rounds", lambda: fresh)
    ordered = list(catalog.entries())
    assert ordered.index(name) > len(names) // 2


def test_failed_rows_do_not_count_as_checked(tmp_path, monkeypatch):
    """An entry whose driver row failed must rotate back into the
    window (sort as never-checked), not hide at the end as 'recent'."""
    import json
    import os

    import dsp_spark.catalog as cat

    art = {
        "good_entry": {"rows_match": True, "schema_match": True,
                       "hash_match": True, "err": None},
        "hash_fail": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "errored": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "AnalysisException: boom"},
    }
    path = tmp_path / "CORRECTNESS_r07.json"
    path.write_text(json.dumps(art))
    monkeypatch.setattr("glob.glob", lambda pat: [str(path)])
    rounds = cat._driver_checked_rounds()
    assert rounds.get("good_entry") == 7
    assert "hash_fail" not in rounds
    assert "errored" not in rounds


def test_order_survives_missing_artifacts(monkeypatch):
    monkeypatch.setattr(catalog, "_driver_checked_rounds", lambda: {})
    ordered = list(catalog.entries())
    assert len(ordered) == len(set(ordered))
    # static priority list leads when no artifacts exist
    assert ordered[0] == catalog._DRIVER_WINDOW_FIRST[0]


def test_queries_and_oracles_consistent():
    qs = catalog.queries()
    os_ = catalog.oracle_sql()
    assert set(os_) <= set(qs)
    # iteration order identical between the two driver entry points
    common = [n for n in qs if n in os_]
    assert common == list(os_)


def test_current_window_holds_the_rotated_priority_entries():
    """Until the round-4 correctness gate has run (no CORRECTNESS_r04
    artifact yet), the 50-entry driver window must still contain the
    three round-1-errored events entries at its tail — adding a catalog
    entry would silently displace them past the gate, burying their
    re-verification for another round. Once the gate's artifact lands,
    rotation legitimately reorders and this guard retires itself."""
    import os

    from dsp_spark import catalog

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.exists(os.path.join(root, "CORRECTNESS_r04.json")):
        return  # gate ran; the window has moved on by design
    window = set(list(catalog.queries())[:50])
    assert {
        "events_range_join_pairs",
        "events_multigrain_rollup",
        "events_sliding_window",
    } <= window, (
        "a new catalog entry displaced the round-1-errored events trio "
        "from the driver window — register it AFTER the round-4 gate runs"
    )
