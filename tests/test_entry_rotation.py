"""The driver-gate rotation in __spark_entry__: unconfirmed queries
front the ~50-query window, recheck entries expire when a round at or
after their rewrite round re-confirms them, deferred queries rotate in
once confirmed."""

from __future__ import annotations

import json

import __spark_entry__ as ent


def _fake_rounds(tmp_path, monkeypatch, rounds: dict[int, dict]) -> None:
    for n, rows in rounds.items():
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))
    monkeypatch.setattr(ent, "_HERE", str(tmp_path))


def test_unconfirmed_queries_front_the_window(tmp_path, monkeypatch):
    some = list(ent.QUERIES)[:10]
    _fake_rounds(tmp_path, monkeypatch, {
        1: {n: {"hash_match": True} for n in some},
    })
    names = list(ent.queries())
    pinned = set(ent._RECHECK) | set(ent._RECHECK_SOFT) | set(ent._DEFER)
    assert set(names[-len(some):]) >= set(some) - pinned
    assert all(n not in some or n in pinned for n in names[:5])


def test_recheck_expires_at_or_after_rewrite_round(tmp_path, monkeypatch):
    target = next(iter(ent._RECHECK))
    rewrite_round = ent._RECHECK[target]
    first_defer = ent._DEFER[0]
    # confirmation BEFORE the rewrite round does not expire the entry:
    # the recheck slot sits AHEAD of the deferred queries
    _fake_rounds(tmp_path, monkeypatch, {
        rewrite_round - 1: {target: {"hash_match": True}},
    })
    names = list(ent.queries())
    assert names.index(target) < names.index(first_defer)
    # ... but a confirmation AT the rewrite round moves it to the
    # confirmed tail, behind the defers
    _fake_rounds(tmp_path, monkeypatch, {
        rewrite_round - 1: {target: {"hash_match": True}},
        rewrite_round: {target: {"hash_match": True}},
    })
    names = list(ent.queries())
    assert names.index(target) > names.index(first_defer)


def test_rows_only_counts_as_confirmed(tmp_path, monkeypatch):
    name = "approx_percentile_sketch"  # rows-only by design
    _fake_rounds(tmp_path, monkeypatch, {
        1: {name: {"err": "no_oracle", "spark_rows": 5,
                   "hash_match": None}},
    })
    names = list(ent.queries())
    assert names.index(name) > len(names) // 2


def test_rows_only_confirmation_expires_when_oracle_added(tmp_path,
                                                          monkeypatch):
    """A query confirmed rows-only in an old round but oracled SINCE
    must re-front: the weak row no longer reflects what the gate would
    check (r2 VERDICT item 6 — multimodal_feature_extract was
    rows-only in r1, upgraded to a SQL oracle in r2, and needs a real
    hash row)."""
    name = "multimodal_feature_extract"
    assert name in ent.ORACLES  # the upgrade this test is about
    others = [n for n in list(ent.QUERIES)[:20] if n != name]
    _fake_rounds(tmp_path, monkeypatch, {
        1: {name: {"err": "no_oracle", "spark_rows": 500,
                   "hash_match": None},
            **{n: {"hash_match": True} for n in others}},
    })
    confirmed, _ = ent._confirmed()
    assert name not in confirmed
    # fronted ahead of every hash-confirmed query
    names = list(ent.queries())
    assert names.index(name) < min(
        names.index(n) for n in others
        if n not in ent._RECHECK and n not in ent._DEFER
    )


def test_soft_recheck_sits_between_backlog_and_confirmed(tmp_path,
                                                         monkeypatch):
    """Soft rechecks (no-op edits of confirmed queries) must come AFTER
    every unconfirmed query but BEFORE the confirmed tail, and expire
    once re-confirmed at/after their rewrite round."""
    soft = next(iter(ent._RECHECK_SOFT))
    rewrite_round = ent._RECHECK_SOFT[soft]
    plain = [n for n in list(ent.QUERIES)
             if n not in ent._RECHECK and n not in ent._RECHECK_SOFT
             and n not in ent._DEFER][:5]
    # soft confirmed BEFORE its rewrite round, plain queries confirmed
    _fake_rounds(tmp_path, monkeypatch, {
        rewrite_round - 1: {soft: {"hash_match": True},
                            **{n: {"hash_match": True} for n in plain}},
    })
    names = list(ent.queries())
    confirmed, _ = ent._confirmed()
    i_soft = names.index(soft)
    # behind every unconfirmed query (other soft members are themselves
    # in the soft band, so exclude the band)...
    assert all(names.index(n) < i_soft
               for n in names
               if n not in confirmed and n not in ent._RECHECK_SOFT)
    # ...but ahead of every plain confirmed query
    assert all(i_soft < names.index(n) for n in plain)
    # re-confirmation at the rewrite round expires it behind the plains
    _fake_rounds(tmp_path, monkeypatch, {
        rewrite_round - 1: {n: {"hash_match": True} for n in plain},
        rewrite_round: {soft: {"hash_match": True}},
    })
    names = list(ent.queries())
    assert names.index(soft) > min(names.index(n) for n in plain)


def test_no_correctness_files_means_everything_fresh(tmp_path, monkeypatch):
    monkeypatch.setattr(ent, "_HERE", str(tmp_path))
    names = list(ent.queries())
    assert len(names) == len(ent.QUERIES)
    # rechecks and defers keep their relative position even with no files
    assert set(ent._RECHECK) | set(ent._DEFER) <= set(names)
