import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig, load_yaml_config, parse_opencv_yaml

REFERENCE_YAML = "/root/reference/Examples/Monocular/ETH_small.yaml"


def test_parse_opencv_yaml_scalars_and_matrices():
    text = """%YAML:1.0
# comment
Camera.fx: 435.5
Viewer.PointSize:2
NMI.Init1: !!opencv-matrix
    rows: 4
    cols: 4
    dt: f
    data: [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
"""
    d = parse_opencv_yaml(text)
    assert d["Camera.fx"] == 435.5
    assert d["Viewer.PointSize"] == 2
    np.testing.assert_allclose(d["NMI.Init1"], np.eye(4))


def test_load_reference_yaml():
    cfg = load_yaml_config(REFERENCE_YAML)
    assert cfg.camera.width == 960 and cfg.camera.height == 540
    assert abs(cfg.camera.fx - 435.04593205) < 1e-6
    assert cfg.orb.n_features == 2000
    assert cfg.orb.n_levels == 8
    assert cfg.nmi.offset == 10
    assert abs(cfg.nmi.threshold - 0.1) < 1e-9
    assert cfg.nmi.grid.synth_num == (3, 3, 3)
    assert cfg.nmi.grid.synth_step == (0.2, 0.2, 0.5)
    assert cfg.nmi.init1 is not None and cfg.nmi.init1.shape == (4, 4)
    # pose matrix round-trips exactly (ETH_small.yaml:62-66)
    assert abs(float(cfg.nmi.init1[0, 3]) - (-73.0683)) < 1e-4


def test_features_per_level_sums_to_budget():
    cfg = SystemConfig()
    per = cfg.orb.features_per_level()
    assert per.sum() == cfg.orb.n_features
    assert (per[:-1] >= per[1:] - 1).all()  # geometric decay


def test_load_eth_sequence_reference_layout(tmp_path):
    """mono_ETH.cc:164-199: `<seq>/_times.txt` + generated `%05d.jpg` names
    from a per-part start index (no _files.txt in the reference)."""
    from orbslam2_nmi_tpu.io.datasets import load_eth_sequence

    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    (seq_dir / "_times.txt").write_text("0.0\n0.1\n0.2\n")
    seq = load_eth_sequence(str(seq_dir), start_index=20513)
    assert len(seq) == 3
    assert seq.image_paths[0].endswith("seq/20513.jpg")
    assert seq.image_paths[2].endswith("20515.jpg")
    np.testing.assert_allclose(seq.timestamps, [0.0, 0.1, 0.2])
