"""Decision-boundary margin audits (round-9, VERDICT r8 items 1 & 4).

Class lesson of the round-8 `burst_detection` driver red: a query whose
OUTPUT is a decision (boolean / rank / keep-drop) derived from float
comparisons has no tolerance — the harness's %.6g normalization forgives
float drift in VALUE columns but a decision either matches or it
doesn't. Local-replica green is therefore necessary but NOT sufficient:
a different engine build evaluating a transcendental a few ulps apart
can flip a decision whose input sits on a quantization or comparison
boundary.

These audits certify, at BOTH gate SFs, that every such decision input
sits farther from its boundary than any plausible cross-engine
difference. Each audit computes the decision input two independent ways
(DuckDB's ln/arithmetic and Python's libm) and asserts BOTH sit outside
the guard band — two independent libms agreeing within the band bounds
what a third (the driver's build) can do, because correctly-rounded-ish
libm implementations differ by ulps, orders of magnitude under the
band.

Guard-band arithmetic for burst_detection (round-10, quantum 1e6 ->
1e3 after TWO driver reds whose only remaining variable was the
driver's DuckDB build — VERDICT r9 item 1a): costs quantize via
floor(x*1e3 + 0.5); the only engine-varying term is ln. Even granting
a hostile 1e-13 RELATIVE ln error (fast-math / vectorized builds — far
beyond the ~4e-16 of any correctly-rounded-ish libm), amplified by
c <= n ~ 1e3 at gate SFs and the 1e3 scale, the worst-case
cross-engine wiggle is ~2e-8 milli-units. Band = 1e-5: 500x that
hostile bound; measured floors are 2.4e-4 (sf0.001) / 2.2e-3 (sf0.01)
— 24x-200x above the band, 10000x above the hostile wiggle. At the old
1e6 quantum the same hostile model gave ~2e-5 micro-units, ABOVE the
then-measured 1.02e-5 floor — exactly the class of divergence the
driver kept exhibiting.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

# hostile-libm cross-engine ln wiggle in milli-units (module docstring)
LN_WIGGLE = 2e-8
BURST_BAND = 500 * LN_WIGGLE  # 1e-5; measured floors: 2.4e-4 / 2.2e-3


def _boundary_margin(x: float) -> float:
    """Distance of a pre-quantization product (x*quantum) from its
    floor(x+0.5) jump (the .5 fractional line) — how far a cross-engine
    wiggle must push to flip the quantized integer."""
    fr = x - math.floor(x)
    return abs(fr - 0.5)


@pytest.mark.parametrize("sf", SFS)
def test_burst_detection_cost_margins(sf):
    """Every burst_detection quantization input, at both gate SFs, in
    both DuckDB and Python libm, sits > BURST_BAND from its boundary —
    so any IEEE-quality third engine (the driver's DuckDB build)
    quantizes to the identical integers and the Viterbi (pure integer
    arithmetic with pinned tie-breaks) is bit-determined."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    rows = con.execute("""
    WITH daily AS (
      SELECT event_type AS grp, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT day, SUM(c) AS n FROM daily GROUP BY day),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    cal AS (
      SELECT g.grp, CAST(u.day AS DATE) AS day
      FROM (SELECT DISTINCT grp FROM daily) g,
           (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span) u
    ),
    filled AS (
      SELECT cal.grp, cal.day, COALESCE(d.c, 0) AS c, COALESCE(t.n, 0) AS n
      FROM cal LEFT JOIN daily d ON cal.grp = d.grp AND cal.day = d.day
               LEFT JOIN tot t ON cal.day = t.day
    ),
    stats AS (
      SELECT grp,
             CAST(SUM(c) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS p0,
             least(1.0 - 1e-6, 2.0 * CAST(SUM(c) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE)) AS p1
      FROM filled GROUP BY grp
    )
    SELECT f.c, f.n, s.p0, s.p1,
       -(CAST(f.c AS DOUBLE) * ln(s.p0)
         + CAST(f.n - f.c AS DOUBLE) * ln(1.0 - s.p0)) * 1e3 AS x0,
       -(CAST(f.c AS DOUBLE) * ln(s.p1)
         + CAST(f.n - f.c AS DOUBLE) * ln(1.0 - s.p1)) * 1e3 AS x1
    FROM filled f JOIN stats s ON f.grp = s.grp WHERE f.n > 0
    """).fetchall()
    assert rows, "no scored days — data shape drifted"
    min_margin = math.inf
    for c, n, p0, p1, x0_duck, x1_duck in rows:
        # python-libm replay of the SAME expression shape
        x0_py = -(c * math.log(p0) + (n - c) * math.log(1.0 - p0)) * 1e3
        x1_py = -(c * math.log(p1) + (n - c) * math.log(1.0 - p1)) * 1e3
        for x_duck, x_py in ((x0_duck, x0_py), (x1_duck, x1_py)):
            # the two libms must themselves agree within the wiggle
            # bound (scaled: amplification is c, n-c times the 1e3)
            assert abs(x_duck - x_py) < LN_WIGGLE * 10, (
                f"duckdb/python ln disagree beyond model: "
                f"{x_duck!r} vs {x_py!r} (c={c}, n={n})"
            )
            for x in (x_duck, x_py):
                m = _boundary_margin(x)
                min_margin = min(min_margin, m)
                assert m > BURST_BAND, (
                    f"cost {x!r} (c={c}, n={n}) sits {m:.3g} from its "
                    f"floor boundary — under the {BURST_BAND:g} band; "
                    f"widen the quantum or reformulate (VERDICT r8 #1)"
                )
    # keep the measured floor visible in -v runs
    assert min_margin > BURST_BAND


# ---------------------------------------------------------------------------
# The other decision-typed registered queries, audited the same way.
#
# NOT audited, with reasons (VERDICT r8 item 4 asks for a documented
# adjudication of each):
# - skyline_parts: dominance tests compare STORED parquet doubles and
#   exact integer counts — no transcendental enters any comparison, and
#   IEEE comparisons of identical bit patterns are engine-independent.
# - dedup keep/drop decisions (exact/minhash/simhash/containment):
#   thresholds compare integer hash matches and exact integer-ratio
#   Jaccard fractions (single IEEE divisions of integers) — again no
#   transcendental, deterministic across engines.
# - ewma_control / holt_forecast etc.: float OUTPUT columns go through
#   the harness's %.6g normalization (tolerant); their booleans
#   (in_control) compare integer-quantized values like cusum below.
# ---------------------------------------------------------------------------

CUSUM_BAND = 1e-4  # measured floors: 9.75e-4 (sf0.001), 2.21e-3 (sf0.01)


@pytest.mark.parametrize("sf", SFS)
def test_cusum_drift_quantization_margins(sf):
    """cusum_drift quantizes z = (c - mean)/sd to micro-units with
    round(); mean/sd derive from exact integer sums via IEEE div/sqrt
    (engine-identical), so the only cross-engine hazard is the rounding
    of a value whose shortest decimal repr straddles .5 (the Spark
    BigDecimal.valueOf hazard). Assert every z*1e6 sits > band from the
    .5 line at both gate SFs."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    rows = con.execute("""
    WITH daily AS (
      SELECT event_type AS grp, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    cal AS (
      SELECT g.grp, CAST(u.day AS DATE) AS day
      FROM (SELECT DISTINCT grp FROM daily) g,
           (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span) u
    ),
    full_ AS (
      SELECT cal.grp, cal.day, COALESCE(d.c, 0) AS c
      FROM cal LEFT JOIN daily d ON cal.grp = d.grp AND cal.day = d.day
    ),
    stats AS (
      SELECT grp, CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean,
             sqrt(greatest(CAST(SUM(c*c) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(c) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 0.0)) AS sd
      FROM full_ GROUP BY grp
    )
    SELECT (CAST(f.c AS DOUBLE) - s.mean) / s.sd * 1000000.0 AS x
    FROM full_ f JOIN stats s ON f.grp = s.grp WHERE s.sd > 0
    """).fetchall()
    assert rows
    for (x,) in rows:
        m = _boundary_margin(x)
        assert m > CUSUM_BAND, (
            f"cusum z quantization input {x!r} sits {m:.3g} from .5"
        )


MK_ROUND9_BAND = 1e-3   # measured floors: 0.049 / 0.0425 (in 1e-9 units)
MK_ALPHA_BAND = 1e-3    # measured floors: 0.252 / 0.708 (z units)
MK_ALPHA = 1.959963984540054


@pytest.mark.parametrize("sf", SFS)
def test_mann_kendall_trend_margins(sf):
    """mann_kendall's trend flag compares round(z, 9) to alpha_z. S and
    var are exact integers; sd = sqrt(var/18) and the division are
    engine-identical IEEE ops, so the hazards are (a) the round(z, 9)
    repr boundary and (b) a z sitting ON alpha_z. Replay the statistic
    exactly (integer S over the calendar-filled daily counts, the
    operator's tie-corrected variance and continuity correction) and
    assert both margins at both gate SFs."""
    import datetime
    from collections import Counter

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    daily = con.execute("""
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    """).fetchall()
    days = sorted({r[1] for r in daily})
    d0, d1 = min(days), max(days)
    allday = [d0 + datetime.timedelta(days=i)
              for i in range((d1 - d0).days + 1)]
    cnt = {(r[0], r[1]): r[2] for r in daily}
    checked = 0
    for grp in sorted({r[0] for r in daily}):
        xs = [cnt.get((grp, d), 0) for d in allday]
        n = len(xs)
        s_stat = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n) for j in range(i + 1, n)
        )
        ties = Counter(xs)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        if var18 <= 0:
            continue
        sd = math.sqrt(var18 / 18.0)
        z = ((s_stat - 1) / sd if s_stat > 0
             else ((s_stat + 1) / sd if s_stat < 0 else 0.0))
        m9 = _boundary_margin(z * 1e9)
        assert m9 > MK_ROUND9_BAND, (
            f"{grp}: z*1e9 {z * 1e9!r} sits {m9:.3g} from its round(9) "
            "boundary"
        )
        zr = round(z * 1e9) / 1e9
        ma = abs(abs(zr) - MK_ALPHA)
        assert ma > MK_ALPHA_BAND, (
            f"{grp}: rounded z {zr!r} sits {ma:.3g} from alpha_z"
        )
        checked += 1
    assert checked > 0
