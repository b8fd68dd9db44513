"""Argv-driven CLI coverage: every validation exit + the warning + happy paths.

The reference validates its flag surface in ``__main__`` (GCI.py:1076-1110,
utility/GCI_score.py:578-636, utility/filter_bam.py:297-368); these tests
drive our ``main(argv)`` entry points through the same branches so the CLI
layer itself — not just the underlying run functions — is covered.
"""
import os

import pytest

from tests.fixtures import make_bam, make_fasta, random_reads

REFS = ["chrA", "chrB"]
LENS = [12000, 9000]


@pytest.fixture(scope="module")
def cli_inputs(tmp_path_factory):
    import numpy as np

    rng = np.random.default_rng(0xC11)
    d = tmp_path_factory.mktemp("cli_inputs")
    ref = str(d / "ref.fa")
    recs = []
    for r, L in zip(REFS, LENS):
        recs.append((r, "".join(rng.choice(list("ACGT"), size=L))))
    make_fasta(ref, recs)
    bam = str(d / "reads.bam")
    make_bam(bam, REFS, LENS, random_reads(rng, REFS, LENS, 120))
    return ref, bam


def _exit_message(excinfo):
    return str(excinfo.value.code) if excinfo.value.code is not None else ""


# ---------------------------------------------------------------------- gci


def test_cli_requires_read_type(cli_inputs):
    from gci_tpu.cli import main

    ref, _ = cli_inputs
    with pytest.raises(SystemExit) as e:
        main(["-r", ref])
    assert "at least one type of TGS reads" in _exit_message(e)


def test_cli_requires_bam_per_type(cli_inputs, tmp_path):
    from gci_tpu.cli import main

    ref, _ = cli_inputs
    paf = str(tmp_path / "only.paf")
    open(paf, "w").close()
    with pytest.raises(SystemExit) as e:
        main(["-r", ref, "--hifi", paf])
    assert "at least one PacBio HiFi reads bam file" in _exit_message(e)


def test_cli_rejects_missing_alignment_file(cli_inputs):
    from gci_tpu.cli import main

    ref, _ = cli_inputs
    with pytest.raises(SystemExit) as e:
        main(["-r", ref, "--hifi", "/nonexistent/x.bam"])
    assert "is not an available file" in _exit_message(e)


def test_cli_requires_reference(cli_inputs):
    from gci_tpu.cli import main

    _, bam = cli_inputs
    with pytest.raises(SystemExit) as e:
        main(["--hifi", bam])
    assert "Please input the reference file" in _exit_message(e)


def test_cli_rejects_missing_reference(cli_inputs):
    from gci_tpu.cli import main

    _, bam = cli_inputs
    with pytest.raises(SystemExit) as e:
        main(["-r", "/nonexistent/ref.fa", "--hifi", bam])
    assert "is not an available file" in _exit_message(e)


def test_cli_mq_warning_and_happy_path(cli_inputs, tmp_path, capsys):
    """map_qual>mq_cutoff warns to stderr (GCI.py:1106-1110) but still runs;
    the argv-driven run matches a direct run_gci call byte-for-byte."""
    from gci_tpu.cli import main
    from gci_tpu.pipeline import run_gci

    ref, bam = cli_inputs
    d1 = str(tmp_path / "via_cli")
    main([
        "-r", ref, "--hifi", bam, "-d", d1, "-o", "W",
        "-mq", "60", "--mq-cutoff", "50",
    ])
    err = capsys.readouterr().err
    assert "WARNING!!!" in err and "minium mapping quality" in err

    d2 = str(tmp_path / "direct")
    run_gci(hifi=[bam], reference=ref, directory=d2, prefix="W",
            map_qual=60, mq_cutoff=50)
    for name in ("W.gci", "W.0.depth.bed"):
        with open(os.path.join(d1, name), "rb") as fa, open(
            os.path.join(d2, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name


def test_cli_version(capsys):
    from gci_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--version"])


# ---------------------------------------------------------------- gci-score


def test_score_cli_validation(cli_inputs, tmp_path):
    from gci_tpu.tools.score_only import main

    ref, _ = cli_inputs
    with pytest.raises(SystemExit) as e:
        main(["-r", ref])
    assert "at least one depth file" in _exit_message(e)

    with pytest.raises(SystemExit) as e:
        main(["-r", ref, "--hifi", "/nonexistent/h.depth.gz"])
    assert "is not an available file" in _exit_message(e)

    dg = str(tmp_path / "h.depth.gz")
    import gzip

    with gzip.open(dg, "wb") as f:
        f.write(b">chrA\n" + b"1\n" * LENS[0] + b">chrB\n" + b"1\n" * LENS[1])

    with pytest.raises(SystemExit) as e:
        main(["--hifi", dg])
    assert "Please input the reference file" in _exit_message(e)

    with pytest.raises(SystemExit) as e:
        main(["-r", "/nonexistent/ref.fa", "--hifi", dg])
    assert "is not an available file" in _exit_message(e)

    bed = str(tmp_path / "r.bed")
    with open(bed, "w") as f:
        f.write("chrA\t0\t100\n")
    with pytest.raises(SystemExit) as e:
        main(["-r", ref, "--hifi", dg, "--bed", "-R", bed])
    assert "can't be used along with" in _exit_message(e)


def test_score_cli_happy_path(cli_inputs, tmp_path):
    from gci_tpu.tools.score_only import main

    ref, _ = cli_inputs
    import gzip

    dg = str(tmp_path / "h.depth.gz")
    with gzip.open(dg, "wb") as f:
        f.write(b">chrA\n" + b"2\n" * LENS[0] + b">chrB\n" + b"2\n" * LENS[1])
    d = str(tmp_path / "out")
    main(["-r", ref, "--hifi", dg, "-d", d, "-o", "S"])
    assert os.path.exists(os.path.join(d, "S.gci"))


# ------------------------------------------------------------ gci-filter-bam


def test_filter_bam_cli_validation(cli_inputs, tmp_path):
    from gci_tpu.tools.filter_bam import main

    ref, bam = cli_inputs
    with pytest.raises(SystemExit):
        main(["/nonexistent/x.bam"])

    paf = str(tmp_path / "x.paf")
    open(paf, "w").close()
    with pytest.raises(SystemExit):
        main([paf])  # no bam among inputs

    with pytest.raises(SystemExit):
        main([bam, "-o"])  # empty prefix list

    with pytest.raises(SystemExit):
        main([bam, "-o", "a", "b"])  # 2 prefixes for 1 bam, no -p

    with pytest.raises(SystemExit):
        main([bam, "-p", "-o", "a", "b", "c"])  # -p wants 1 or bam_num+1

    with pytest.raises(SystemExit):
        main([bam, "-p", "-o", "a", "b"])  # -p without reference

    with pytest.raises(SystemExit):
        main([bam, "-p", "-o", "a", "b", "-ref", ref])  # -p without region


def test_filter_bam_cli_happy_path(cli_inputs, tmp_path, capsys):
    from gci_tpu.tools.filter_bam import main

    _, bam = cli_inputs
    d = str(tmp_path / "fb")
    main([bam, "-d", d, "-o", "FB", "-mq", "60", "--mq-cutoff", "50", "-t", "1"])
    out = capsys.readouterr().out
    assert "WARNING!!!" in out  # filter_bam warns on stdout (filter_bam.py:313)
    assert os.path.exists(os.path.join(d, "FB.bam"))
    assert os.path.exists(os.path.join(d, "FB.bam.bai"))
