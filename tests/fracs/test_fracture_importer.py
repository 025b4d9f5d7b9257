"""Tests for CSV fracture network import."""

import numpy as np

from porepy_tpu.fracs import fracture_importer


def test_network_2d_from_csv(tmp_path):
    f = tmp_path / "fracs.csv"
    f.write_text(
        "FID,START_X,START_Y,END_X,END_Y\n"
        "0,0.0,0.0,1.0,1.0\n"
        "1,0.5,0.0,0.5,1.0\n"
        "2,0.2,0.2,0.2,0.2\n"  # degenerate: skipped
    )
    net, fid = fracture_importer.network_2d_from_csv(str(f), return_frac_id=True)
    assert len(net.fractures) == 2
    assert np.allclose(fid, [0, 1])
    assert np.allclose(net.fractures[0].pts, [[0, 1], [0, 1]])
    assert np.allclose(net.fractures[1].pts, [[0.5, 0.5], [0, 1]])


def test_network_2d_from_csv_polyline(tmp_path):
    f = tmp_path / "poly.csv"
    f.write_text(
        "FID,PT_X,PT_Y\n"
        "7,0.0,0.0\n"
        "7,0.5,0.1\n"
        "7,1.0,0.0\n"
        "9,0.0,1.0\n"
        "9,1.0,1.0\n"
    )
    net, fid = fracture_importer.network_2d_from_csv(
        str(f), polyline=True, return_frac_id=True
    )
    # Polyline 7 has two segments, polyline 9 one.
    assert len(net.fractures) == 3
    assert np.allclose(fid, [7, 7, 9])
    assert np.allclose(net.fractures[1].pts, [[0.5, 1.0], [0.1, 0.0]])


def test_network_3d_from_csv(tmp_path):
    f = tmp_path / "fracs3d.csv"
    f.write_text(
        "0,0,0,1,1,1\n"
        "0.2,0.2,0.5,0.8,0.2,0.5,0.8,0.8,0.5,0.2,0.8,0.5\n"
    )
    net = fracture_importer.network_3d_from_csv(str(f))
    assert net.domain is not None
    assert net.domain.bounding_box["xmax"] == 1.0
    assert len(net.fractures) == 1
    assert net.fractures[0].pts.shape == (3, 4)
    assert np.allclose(net.fractures[0].pts[2], 0.5)


def test_network_3d_from_csv_no_domain(tmp_path):
    f = tmp_path / "fracs3d.csv"
    f.write_text("0,0,0, 1,0,0, 1,1,0, 0,1,0\n")
    net = fracture_importer.network_3d_from_csv(str(f), has_domain=False)
    assert net.domain is None
    assert len(net.fractures) == 1
