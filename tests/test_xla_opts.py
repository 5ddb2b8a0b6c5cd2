"""utils/xla_opts.py: option parsing + backend gating."""

from resnet_tpu.utils.xla_opts import TPU_DEFAULTS, compiler_options, parse_opts


def test_parse_opts():
    assert parse_opts("") == {}
    assert parse_opts(None) == {}
    assert parse_opts("a=1") == {"a": "1"}
    assert parse_opts("a=1, b = x ") == {"a": "1", "b": "x"}


def test_off_disables_everything():
    assert compiler_options("off", backend="tpu") is None


def test_cpu_gets_no_tpu_defaults():
    assert compiler_options(None, backend="cpu") is None
    assert compiler_options("a=1", backend="cpu") == {"a": "1"}


def test_tpu_defaults_plus_explicit():
    got = compiler_options("k=v", backend="tpu")
    want = dict(TPU_DEFAULTS)
    want["k"] = "v"
    assert got == want


def test_tpu_defaults_deliberately_empty():
    """Every scoped-VMEM candidate measured SLOWER on the clock despite a
    better cost model (PERF_NOTES.md round-2 table) — an entry here must
    come with a bench.py win, so pin emptiness."""
    assert TPU_DEFAULTS == {}
