"""Unit pins for the Bradley-Terry MM fit helper — in particular the
r6 ADVICE degenerate case: >=2 contenders with zero total wins must
yield expected-wins 0 (not NaN) so the stationarity certificate stays
well-defined."""

from __future__ import annotations

import numpy as np

from mediawiki_to_notion_spark.operators.analytics_ext import (
    BT_BAND_PPM,
    _bt_mm_fit,
)


def _band_ok(expected, total_wins, n_matches):
    return np.abs(expected - total_wins) <= n_matches * BT_BAND_PPM / 1e6


def test_two_zero_win_contenders_no_nan():
    # Contenders 0 and 1 never win anything (2 beats both 5-0, and
    # their head-to-head matches were all drawn/unscored).  Their
    # strengths collapse to 0.0 after the first MM iteration; the
    # 0-vs-1 pairing (games>0, strength sum 0) is the NaN trap.
    n = 3
    games = np.zeros((n, n))
    wins = np.zeros((n, n))
    games[0, 2] = games[2, 0] = 5
    games[1, 2] = games[2, 1] = 5
    games[0, 1] = games[1, 0] = 3
    wins[2, 0] = 5
    wins[2, 1] = 5
    expected, total_wins, n_matches = _bt_mm_fit(games, wins)
    assert np.all(np.isfinite(expected))
    assert total_wins[0] == 0 and total_wins[1] == 0
    assert expected[0] == 0.0 and expected[1] == 0.0
    assert bool(_band_ok(expected, total_wins, n_matches).all())


def test_balanced_tournament_stationary():
    rng = np.random.RandomState(7)
    n = 5
    true_strength = rng.uniform(0.5, 2.0, n)
    games = np.zeros((n, n))
    wins = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            g = 200
            p = true_strength[i] / (true_strength[i] + true_strength[j])
            w = rng.binomial(g, p)
            games[i, j] = games[j, i] = g
            wins[i, j] = w
            wins[j, i] = g - w
    expected, total_wins, n_matches = _bt_mm_fit(games, wins)
    assert bool(_band_ok(expected, total_wins, n_matches).all())


def test_single_dominant_winner():
    # One contender wins EVERYTHING -> every other strength collapses.
    n = 4
    games = np.zeros((n, n))
    wins = np.zeros((n, n))
    for j in range(1, n):
        games[0, j] = games[j, 0] = 7
        wins[0, j] = 7
    expected, total_wins, n_matches = _bt_mm_fit(games, wins)
    assert np.all(np.isfinite(expected))
    assert bool(_band_ok(expected, total_wins, n_matches).all())
