"""Deterministic cross-engine synthetic-data expressions (SURVEY.md §1.2, §7.4.2).

The reference seeds `random` / `np.random` (app.py:117-118) and draws blob
parameters with `random.uniform` (app.py:138-140) and boundary noise with
`np.random.rand` (app.py:142). NumPy bit-parity is impossible in SQL, so the
engine's scale-path generator is a 31-bit LCG written in *pure integer
arithmetic* that evaluates identically in Spark SQL and DuckDB — every
intermediate stays < 2^62, so no overflow under Spark ANSI mode, and `%` on
non-negative ints agrees across engines. This gives exact (bit-identical)
uniform draws on both sides of the correctness gate.

These helpers return SQL *text* consumed via `spark.sql`/`F.expr` on the
Spark side and embedded verbatim into the DuckDB oracle SQL — one formula,
two engines, zero drift.

CROSS-ENGINE LITERAL RULE: float literals must be written in exponent
notation (`0.5e0`), because Spark parses plain decimal literals (`0.5`) as
DECIMAL while DuckDB parses them as DOUBLE — decimal arithmetic then
propagates through Spark's type rules and the two engines compute different
things. `flit()` enforces this; never interpolate a bare float repr.
"""

from __future__ import annotations

import math

M31 = 2_147_483_648  # 2**31
LCG_A = 1_103_515_245
LCG_C = 12_345

TWO_PI = "6.283185307179586e0"


def flit(x: float) -> str:
    """Float literal both engines parse as DOUBLE (shortest-roundtrip repr)."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def q6(expr: str, nd: int = 6) -> str:
    """Cross-engine float quantizer: floor(x·10^nd + 0.5)/10^nd.

    Spark's round() (exact BigDecimal HALF_UP) and DuckDB's round()
    (std::round(x·10^d)/10^d) disagree near decimal midpoints; this formula is
    pure IEEE multiply/add/floor/divide, so identical double in → identical
    double out on BOTH engines, which is what the value-hash gate needs.

    MAGNITUDE GUARD (r4 adversarial gate): Spark's floor(DOUBLE) returns
    BIGINT — it SATURATES at 2^63−1 for |x·10^nd| beyond int64 and maps
    NaN to 0 — while DuckDB's floor stays DOUBLE (and its BIGINT cast of
    NaN raises). Dirty real-world values (±1e300, ±Inf, NaN in an events
    stream) therefore diverged inside the quantizer itself. Values with
    |x| ≥ 1e9 pass through UNQUANTIZED: micro-unit rounding is meaningless
    there anyway (doubles are >100 ulp apart past 2^53/10^6 ≈ 9e9), and
    the CASE's `abs(x) < bound` comparison is false for NaN in both
    engines, so NaN/±Inf also pass through identically.
    """
    scale = flit(10**nd)
    bound = flit(10 ** (15 - nd))
    return (
        f"(CASE WHEN abs({expr}) < {bound} "
        f"THEN floor(({expr}) * {scale} + 0.5e0) / {scale} "
        f"ELSE ({expr}) END)"
    )


def sat(expr: str, bound: float) -> str:
    """Saturating clamp to [−bound, bound] with NaN→0, shared text both
    dialects — the front gate for exact-integer (micro/milli-unit) plans
    whose BIGINT casts would otherwise overflow on dirty real-world
    values (±1e300, ±Inf, NaN in an event stream; r4 adversarial gate).
    Explicit CASE order: isnan() MUST be the first branch — both Spark
    and DuckDB order NaN GREATER than every value in comparisons (non-IEEE
    total order), so a leading `x > bound` test would silently saturate
    NaN to +bound instead of 0 (r4 ADVICE). With isnan first, NaN→0 in
    both engines by the shared branch, not by any NaN-ordering accident."""
    b = flit(bound)
    return (
        f"(CASE WHEN isnan({expr}) THEN 0e0 "
        f"WHEN ({expr}) > {b} THEN {b} "
        f"WHEN ({expr}) < -{b} THEN -{b} ELSE ({expr}) END)"
    )


def sum_micro(expr: str, bound: float = 1e6) -> str:
    """Order-free cross-engine float SUM (r6, ADVICE r5): q6 over a float
    sum is data-dependent flaky — Spark's parallel accumulation and
    DuckDB's sequential sum can straddle a 1e-6 quantization boundary.
    Quantize PER TERM to saturating BIGINT micro-units instead
    (floor(sat(x)·10⁶ + 0.5)), sum exactly in int64 (commutative), divide
    once: identical BIGINT in → identical DOUBLE out, by construction.
    Worst case |term| = bound·10⁶; keep n·bound·10⁶ inside 9.2e18."""
    return (
        f"(CAST(coalesce(sum(CAST(floor({sat(expr, bound)} * 1000000e0 "
        "+ 0.5e0) AS BIGINT)), 0) AS DOUBLE) / 1000000e0)"
    )


def sum_micro_int(expr: str, bound: float = 1e6) -> str:
    """BIGINT half of :func:`sum_micro`: the exact per-term-quantized
    int64 sum, kept as an integer so DOWNSTREAM accumulation (window
    frame sums over group totals, multi-level rollups) stays commutative
    too. A DOUBLE frame sum over values on the 1e-6 grid is still IEEE
    accumulation-order-dependent (ADVICE r6) — only the integer form is
    order-free by construction. Divide once at the very end."""
    return (
        f"coalesce(sum(CAST(floor({sat(expr, bound)} * 1000000e0 "
        "+ 0.5e0) AS BIGINT)), 0)"
    )


def lcg_u(key_expr: str, seed: int, draw: int = 0) -> str:
    """Uniform [0,1) double: `draw`-th LCG output for integer key `key_expr`."""
    x = f"((({key_expr}) * 1000003 + {seed} * 7919 + {LCG_C}) % {M31})"
    for _ in range(draw + 1):
        x = f"(({LCG_A} * {x} + {LCG_C}) % {M31})"
    return f"({x} / {flit(M31)})"


def uniform(key_expr: str, seed: int, draw: int, lo: float, hi: float) -> str:
    """Uniform [lo, hi) — mirrors random.uniform at app.py:138-140."""
    return f"({flit(lo)} + {lcg_u(key_expr, seed, draw)} * {flit(hi - lo)})"


def linspace(i_expr: str, lo: str, hi: str, n: int) -> str:
    """Evenly spaced series value — np.linspace (app.py:41-42,141).

    Pure IEEE arithmetic on identical inputs → identical doubles both engines.
    """
    return f"(({lo}) + ({i_expr}) * ((({hi}) - ({lo})) / {flit(n - 1)}))"


def hsv_to_rgb_exprs(h: str, s: str, v: str) -> tuple[str, str, str]:
    """Channel expressions for HSV→RGB (matplotlib hsv_to_rgb, app.py:5,19).

    Standard sextant formula; CASE arithmetic only, identical across engines.
    """
    i = f"(CAST(floor(({h}) * 6) AS BIGINT) % 6)"
    f_ = f"(({h}) * 6 - floor(({h}) * 6))"
    p = f"(({v}) * (1e0 - ({s})))"
    q = f"(({v}) * (1e0 - {f_} * ({s})))"
    t = f"(({v}) * (1e0 - (1e0 - {f_}) * ({s})))"
    r = (
        f"(CASE {i} WHEN 0 THEN ({v}) WHEN 1 THEN {q} WHEN 2 THEN {p} "
        f"WHEN 3 THEN {p} WHEN 4 THEN {t} ELSE ({v}) END)"
    )
    g = (
        f"(CASE {i} WHEN 0 THEN {t} WHEN 1 THEN ({v}) WHEN 2 THEN ({v}) "
        f"WHEN 3 THEN {q} WHEN 4 THEN {p} ELSE {p} END)"
    )
    b = (
        f"(CASE {i} WHEN 0 THEN {p} WHEN 1 THEN {p} WHEN 2 THEN {t} "
        f"WHEN 3 THEN ({v}) WHEN 4 THEN ({v}) ELSE {q} END)"
    )
    return r, g, b


def blob_param_exprs(seed: int, n_blobs: int, id_expr: str = "blob_id") -> dict[str, str]:
    """Per-blob parameter formulas mirroring app.py:138-146 / FIXTURES.md §B.

    r ∈ [0.1,0.26), wobble ∈ [0.08,0.22), cx,cy ∈ [0.12,0.88),
    depth = blob_id/(n-1), color = hsv(h=i/n, s∈[0.35,0.65), v∈[0.75,0.95)).
    """
    h = f"((({id_expr}) % {n_blobs}) / {flit(n_blobs)})"
    s = uniform(f"{id_expr} + 7000000", seed, 0, 0.35, 0.65)
    v = uniform(f"{id_expr} + 9000000", seed, 0, 0.75, 0.95)
    cr, cg, cb = hsv_to_rgb_exprs(h, s, v)
    denom = flit(max(n_blobs - 1, 1))
    return {
        "r": uniform(id_expr, seed, 0, 0.1, 0.26),
        "wobble": uniform(id_expr, seed, 1, 0.08, 0.22),
        "cx": uniform(id_expr, seed, 2, 0.12, 0.88),
        "cy": uniform(id_expr, seed, 3, 0.12, 0.88),
        "depth": f"(({id_expr}) / {denom})",
        "col_r": cr,
        "col_g": cg,
        "col_b": cb,
    }


def series_sql(n: int, alias: str = "i", dialect: str = "spark") -> str:
    """Integer series 0..n-1 — np.linspace/arange support (app.py:26,41,141).

    The ONLY dialect seam in the synthetic pipeline: Spark explodes a
    `sequence`, DuckDB uses its `range` table function. Everything downstream
    is shared text.
    """
    if dialect == "spark":
        # BIGINT cast matters: sequence(int, int) yields INTs and the LCG
        # products would overflow 32-bit under Spark ANSI mode.
        return (
            f"(SELECT CAST(_i AS BIGINT) AS {alias} "
            f"FROM (SELECT explode(sequence(0, {n - 1})) AS _i))"
        )
    return f"(SELECT CAST(range AS BIGINT) AS {alias} FROM range({n}))"


def blobs_sql(seed: int, n_blobs: int, dialect: str) -> str:
    """Blob parameter table — app.py:136-146 / FIXTURES.md §B `blobs`."""
    p = blob_param_exprs(seed, n_blobs)
    cols = ",\n    ".join(f"{expr} AS {name}" for name, expr in p.items())
    return (
        f"SELECT blob_id,\n    {cols}\n"
        f"FROM {series_sql(n_blobs, 'blob_id', dialect)}"
    )


def boundary_sql(
    seed: int, n_blobs: int, dialect: str, n_samples: int = 280
) -> str:
    """Blob boundary samples — app.py:141-144 / FIXTURES.md §B `boundary`.

    theta = 2πk/(n-1); rr = r·(1 + wobble·(u-0.5)·2); px,py quantized to 6 dp
    so both engines treat the polygon vertices as identical exact doubles
    (cos/sin may differ in the last ulp across libm implementations).
    """
    theta = f"({TWO_PI} * k / {flit(n_samples - 1)})"
    noise = lcg_u(f"b.blob_id * {n_samples} + k", seed + 101, 0)
    rr = f"(b.r * (1e0 + b.wobble * ({noise} - 0.5e0) * 2e0))"
    return (
        f"SELECT b.blob_id, k, {theta} AS theta, {rr} AS rr,\n"
        f"  {q6(f'b.cx + {rr} * cos({theta})')} AS px,\n"
        f"  {q6(f'b.cy + {rr} * sin({theta})')} AS py\n"
        f"FROM ({blobs_sql(seed, n_blobs, dialect)}) b\n"
        f"CROSS JOIN {series_sql(n_samples, 'k', dialect)}"
    )


def kernel_sql(sigma: float, dialect: str) -> str:
    """In-engine Gaussian kernel gen+normalize — app.py:22-29.

    x ∈ [-radius, radius], w = exp(-x²/2σ²) / Σw (window-normalized without a
    re-join, SURVEY §2.1-E `agg_sum_normalize`).
    """
    radius = int(3 * sigma + 0.5)
    n = 2 * radius + 1
    raw = (
        f"exp(-((i - {radius}) * (i - {radius})) / "
        f"(2e0 * {flit(sigma)} * {flit(sigma)}))"
    )
    return (
        f"SELECT CAST(i - {radius} AS BIGINT) AS tap,\n"
        f"  {raw} / sum({raw}) OVER () AS weight\n"
        f"FROM {series_sql(n, 'i', dialect)}"
    )


def gaussian_kernel(sigma: float) -> list[tuple[int, float]]:
    """Normalized 1-D Gaussian taps [(offset, weight)] — app.py:22-29.

    radius = int(3σ+0.5), weights exp(-x²/2σ²) normalized to sum 1. Computed
    driver-side in Python so both engines consume identical float literals
    (the kernel is a query constant, like the reference's `gaussian_kernel1d`).
    """
    if sigma <= 0:
        return [(0, 1.0)]
    radius = int(3 * sigma + 0.5)
    raw = [math.exp(-(x * x) / (2 * sigma * sigma)) for x in range(-radius, radius + 1)]
    total = sum(raw)
    return [(x - radius, w / total) for x, w in enumerate(raw)]
