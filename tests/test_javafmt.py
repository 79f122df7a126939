"""Java Double.toString parity: the exact JDK 8 FloatingDecimal emulation
is the oracle; the fast hybrid used in output must agree with it everywhere
(fuzzed), and both must reproduce known JDK 8 outputs, including its famous
non-shortest cases (JDK-4428022 / JDK-4511638)."""

import math

import numpy as np
import pytest

from flashfry_tpu.javafmt import java_double_to_string, jdk8_double_to_string

# hand-checked JDK 8 outputs (spec layout + the documented quirk cases)
GOLDENS = {
    0.0: "0.0",
    1.0: "1.0",
    -1.0: "-1.0",
    100.0: "100.0",
    96.0: "96.0",
    0.023: "0.023",
    0.5: "0.5",
    1 / 3: "0.3333333333333333",
    123456.789: "123456.789",
    0.001: "0.001",
    0.0001: "1.0E-4",
    2.5e-4: "2.5E-4",
    9999999.0: "9999999.0",
    1e7: "1.0E7",
    1e16: "1.0E16",
    # JDK-4428022: 1e23's nearest double renders non-shortest on JDK 8
    1e23: "9.999999999999999E22",
    # Double.MIN_VALUE — JDK 8 prints 4.9E-324, not the shortest 5E-324
    5e-324: "4.9E-324",
    1.7976931348623157e308: "1.7976931348623157E308",
    float("nan"): "NaN",
    float("inf"): "Infinity",
    float("-inf"): "-Infinity",
}


def test_goldens_both_paths():
    for x, want in GOLDENS.items():
        assert java_double_to_string(x) == want, x
        assert jdk8_double_to_string(x) == want, x


def test_negative_zero():
    assert java_double_to_string(-0.0) == "-0.0"
    assert jdk8_double_to_string(-0.0) == "-0.0"


def _all_finite(vals):
    v = np.asarray(vals, dtype=np.float64)
    return v[np.isfinite(v)]


@pytest.mark.parametrize("seed", [0, 1])
def test_hybrid_matches_jdk8_fuzz(seed):
    rng = np.random.default_rng(seed)
    samples = np.concatenate([
        rng.random(4000) * 100,                      # score range
        rng.random(2000),                            # specificity range
        np.exp(rng.normal(size=4000) * 20),          # wide magnitudes
        rng.integers(0, 1 << 63, size=4000,
                     dtype=np.uint64).view(np.float64),
        rng.uniform(2.0 ** 52, 2.0 ** 58, size=3000),  # big-int boundary
        rng.random(2000) * 1e-320,                   # deep subnormals
        rng.random(1000) * 1e-307,                   # shallow subnormals
    ])
    for v in _all_finite(samples).tolist():
        a = java_double_to_string(v)
        assert a == jdk8_double_to_string(v), repr(v)
        # both are Java-layout renderings of the same double
        assert float(a.replace("E", "e")) == v


def test_powers_of_two_match_jdk8():
    for k in range(-1074, 1024):
        v = 2.0 ** k
        assert java_double_to_string(v) == jdk8_double_to_string(v), k
        nv = float(np.nextafter(v, 0))
        assert java_double_to_string(nv) == jdk8_double_to_string(nv), k


def test_layout_rules():
    # decimal layout exactly for 1e-3 <= |x| < 1e7; always one frac digit
    assert java_double_to_string(1234567.0) == "1234567.0"
    assert java_double_to_string(0.25) == "0.25"
    assert java_double_to_string(-0.25) == "-0.25"
    assert "E" in java_double_to_string(12345678.0)
    assert "E" in java_double_to_string(0.0005) or \
        java_double_to_string(0.0005) == "5.0E-4"


def test_small_window_fast_path_fuzz():
    """The (0, 1e-3) E-form fast path (CFD-score territory) must equal the
    exact JDK 8 emulation, including products of table fractions and
    near-power-of-two values."""
    rng = np.random.default_rng(99)
    vals = np.concatenate([
        rng.random(20000) * 1e-3,
        np.exp(rng.uniform(np.log(1e-300), np.log(1e-3), size=20000)),
        np.multiply.reduce(rng.random((5000, 8)) * 0.8 + 0.1, axis=1) * 1e-2,
        np.nextafter(2.0 ** rng.integers(-900, -10, size=5000).astype(float), 0.0),
        2.0 ** rng.integers(-900, -10, size=2000).astype(np.float64),
    ])
    for v in vals.tolist():
        assert java_double_to_string(v) == jdk8_double_to_string(v), repr(v)
        assert java_double_to_string(-v) == jdk8_double_to_string(-v), repr(v)
