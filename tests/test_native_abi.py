"""ABI guard for the native layer.

Round 3 shipped a data-corruption bug: call sites passed bare Python ints
into int64_t parameters with no ctypes argtypes declared, so ctypes passed
them as 32-bit c_int and the C++ side saw garbage upper halves (silently
dropping ~half of pooled native epiread output, and able to read out of
bounds). The fix centralizes every declaration in native._declare; this test
ensures no export can ever be added without a declaration again.
"""
import re

from conftest import REPO


def _exported_names():
    """Function names defined inside extern "C" blocks of native/*.cpp."""
    import glob

    names = set()
    for path in glob.glob(f"{REPO}/biscuit_tpu/native/*.cpp"):
        src = open(path).read()
        # walk extern "C" { ... } regions by brace depth
        for m in re.finditer(r'extern\s+"C"\s*\{', src):
            depth, i = 1, m.end()
            while i < len(src) and depth:
                if src[i] == "{":
                    depth += 1
                elif src[i] == "}":
                    depth -= 1
                i += 1
            region = src[m.end():i]
            # definitions only (name followed by ( ... ) {), depth-1 braces
            for fm in re.finditer(
                    r"^[A-Za-z_][\w:<>,\s*&]*?\b(\w+)\s*\([^;{]*\)\s*\{",
                    region, re.M):
                names.add(fm.group(1))
        # single-line extern "C" declarations/definitions
        for fm in re.finditer(
                r'extern\s+"C"\s+[\w:<>,\s*&]*?\b(\w+)\s*\([^;{]*\)\s*\{',
                src):
            names.add(fm.group(1))
    return names


def test_every_export_has_argtypes():
    from biscuit_tpu import native

    L = native.lib()
    exported = _exported_names()
    assert len(exported) >= 20, f"parser regressed: {sorted(exported)}"
    missing = []
    for name in sorted(exported):
        fn = getattr(L, name, None)
        if fn is None:
            continue  # internal helper matched by the parser
        if fn.argtypes is None:
            missing.append(name)
    assert not missing, (
        f"native exports with no ctypes argtypes declared in "
        f"native._declare: {missing} — bare Python ints would silently "
        f"truncate to 32 bits on int64_t parameters")


def test_scalar_widths_match_source():
    """Spot-check the declared widths of the historically dangerous int64_t
    scalar slots against the C++ signatures (textual, so a signature change
    without a table update fails loudly)."""
    import ctypes as C

    from biscuit_tpu import native

    L = native.lib()
    src = open(f"{REPO}/biscuit_tpu/native/pileup_native.cpp").read()
    assert "int64_t seqlen" in src and "int64_t data_len" in src
    # bt_epiread_window_raw: seqlen is arg index 11, data_len index 19
    at = L.bt_epiread_window_raw.argtypes
    assert at[11] is C.c_int64 and at[19] is C.c_int64
    assert at[8] is C.c_double  # modbam_prob
    at = L.bt_pileup_window_raw.argtypes
    assert at[3] is C.c_int64  # seqlen
    at = L.bt_pileup_window.argtypes
    assert at[3] is C.c_int64  # seqlen
    at = L.bt_bam_scan.argtypes
    assert at[1] is C.c_int64 and at[2] is C.c_int64
