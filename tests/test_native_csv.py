"""Native C++ CSV parser: correctness, error reporting, Python-fallback
parity (skipped cleanly when no toolchain is available)."""

import numpy as np
import pytest

from gpr_tpu.io.native import CsvError, get_lib, load_csv_file, parse_csv_bytes

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def test_parse_basic():
    arr = parse_csv_bytes(b"1.0,2.0,3.5\n4,5e-1,-6\n")
    np.testing.assert_allclose(arr, [[1.0, 2.0, 3.5], [4.0, 0.5, -6.0]])


def test_parse_blank_lines_and_crlf():
    arr = parse_csv_bytes(b"1,2\r\n\r\n3,4\n\n")
    np.testing.assert_allclose(arr, [[1, 2], [3, 4]])


def test_parse_single_column_and_row():
    np.testing.assert_allclose(parse_csv_bytes(b"7.25\n"), [[7.25]])


def test_error_inconsistent_columns():
    with pytest.raises(CsvError, match="incompatible dimension.*line 2"):
        parse_csv_bytes(b"1,2\n3\n")


def test_error_non_numeric():
    with pytest.raises(CsvError, match="line 1"):
        parse_csv_bytes(b"1,abc\n")


def test_error_empty():
    with pytest.raises(CsvError):
        parse_csv_bytes(b"")


def test_file_roundtrip(tmp_path, rng):
    data = rng.standard_normal((50, 4))
    path = tmp_path / "d.csv"
    with open(path, "w") as fh:
        for row in data:
            fh.write(",".join(f"{v:.17g}" for v in row) + "\n")
    arr = load_csv_file(str(path))
    np.testing.assert_allclose(arr, data, rtol=1e-15)


def test_matches_python_parser(rng):
    from gpr_tpu.cli import read_samples

    data = rng.standard_normal((30, 3))
    text = "\n".join(",".join(f"{v:.12g}" for v in row) for row in data) + "\n"
    native = parse_csv_bytes(text.encode())
    python = read_samples(text.splitlines())
    np.testing.assert_allclose(native, python, rtol=1e-12)
