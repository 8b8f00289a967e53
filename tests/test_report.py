"""Report rollup parity: run the actual reference Python scripts (paths
patched) against synthetic result files and diff our reimplementations."""

import os

import numpy as np
import pytest

from kmer_id_tpu.report.rollup import m3_report, readbatch_c3, readc_report

REF = "/root/reference"
rng = np.random.default_rng(77)


def _write_results(dirpath, num_targ, cols):
    os.makedirs(dirpath, exist_ok=True)
    for c in range(cols):
        lines = []
        for t in range(num_targ):
            if rng.random() < 0.02:
                g = int(rng.integers(1, 500))
                u = int(rng.integers(1, 60))
            else:
                g = u = 0
            lines.append(f"{t},{g},{u}")
        with open(os.path.join(dirpath, f"s{c}_result.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "readbatch_c3.py")),
    reason="reference checkout unavailable",
)
def test_readbatch_c3_matches_reference_script(tmp_path):
    refkey = os.path.join(REF, "refKeyc3.txt")
    num_targ = sum(1 for _ in open(refkey)) - 1
    rdir = tmp_path / "results"
    _write_results(str(rdir), num_targ, cols=3)

    src = open(os.path.join(REF, "readbatch_c3.py")).read()
    src = src.replace(
        'mypath = "W:/Mark_backup/ROAR/Saffron/chloro/"', f'mypath = "{rdir}/"'
    )
    src = src.replace(
        'outname ="saffron_chloro.csv"', f'outname ="{tmp_path}/ref.csv"'
    )
    src = src.replace('reffile = "refKeyc3.txt"', f'reffile = "{refkey}"')
    exec(compile(src, "readbatch_c3_patched.py", "exec"), {"__name__": "__main__"})

    readbatch_c3(str(rdir) + "/", refkey, str(tmp_path / "got.csv"))
    assert (tmp_path / "got.csv").read_bytes() == (tmp_path / "ref.csv").read_bytes()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "mitochondria_refkey.txt")),
    reason="reference checkout unavailable",
)
def test_m3_report_on_real_refkey(tmp_path):
    """End-to-end m3 report on the shipped (CRLF!) refkey.

    The reference script divides by zero on the CRLF refkey (SURVEY.md
    §2.2); faithful mode must reproduce that, strip_cr mode must work.
    """
    refkey = os.path.join(REF, "mitochondria_refkey.txt")
    num_targ = sum(1 for _ in open(refkey)) - 1
    result = tmp_path / "result.txt"
    lines = []
    for t in range(num_targ):
        g = int(rng.integers(1, 300)) if rng.random() < 0.01 else 0
        lines.append(f"{t},{g},{g}")
    result.write_text("\n".join(lines) + "\n")

    with pytest.raises(ZeroDivisionError):
        m3_report(str(result), refkey, str(tmp_path / "out.csv"))

    m3_report(str(result), refkey, str(tmp_path / "out.csv"), strip_cr=True)
    out = (tmp_path / "out.csv").read_text().splitlines()
    assert out[0] == "taxid,reads,abundance"
    assert out[1].startswith("total,")
    assert out[2].startswith("no_id,")
    # data rows: name,count(.0f),abundance(.3f)
    for row in out[3:6]:
        parts = row.split(",")
        assert len(parts) == 3
        float(parts[2])


def test_readc_report_structure(tmp_path):
    """kmer_readc.py report-half: structure + normalization semantics."""
    wdir = tmp_path
    (wdir / "key.txt").write_text("0\tnone\n1\troot\n2\tSpA\n3\tSpB\n4\tSpC\n")
    (wdir / "count.txt").write_text("0,0\n1,0\n2,100\n3,36\n4,10\n")  # 4: <=35 out
    jdir = wdir / "jobsX"
    jdir.mkdir()
    (jdir / "jobsX.txt").write_text("j1 1\nreads.fastq\n")
    (jdir / "j1_result.txt").write_text("0,5,0\n1,0,0\n2,80,9\n3,20,4\n4,7,2\n")
    readc_report(
        str(jdir), "jobsX", str(wdir / "key.txt"), str(wdir / "count.txt"),
        str(wdir / "out.csv"),
    )
    out = (wdir / "out.csv").read_text().splitlines()
    assert out[0] == "name,j1,,,"
    assert out[1] == "total,112.0,,,"
    assert out[2] == "no_id,5,,,"
    # SpA: 80/(110) vs SpB: 20/46 -> percentages sum to 100
    rows = {r.split(",")[0]: r.split(",") for r in out[3:]}
    assert set(rows) == {"SpA", "SpB"}
    pct = float(rows["SpA"][3]) + float(rows["SpB"][3])
    assert abs(pct - 100.0) < 1e-9
