"""Abaqus .inp converter tests."""

import numpy as np

from easysimp_tpu.post.vtu import read_vtu

INP_SAMPLE = """** Sample heterogeneous model
*NODE
1, 0.0, 0.0, 0.0
2, 1.0, 0.0, 0.0
3, 1.0, 1.0, 0.0
4, 0.0, 1.0, 0.0
5, 0.0, 0.0, 1.0
6, 1.0, 0.0, 1.0
7, 1.0, 1.0, 1.0
8, 0.0, 1.0, 1.0
9, 2.0, 0.0, 0.0
10, 2.0, 1.0, 0.5
*ELEMENT, TYPE=C3D8, ELSET=solid
1, 1, 2, 3, 4, 5, 6, 7, 8
*ELEMENT, TYPE=C3D4
2, 2, 9, 3, 6
3, 3, 9, 10, 6
*ELEMENT, TYPE=T3D2, ELSET=rods
4, 9, 10
*ELSET, ELSET=tets
2, 3
*ELSET, ELSET=range_set, GENERATE
1, 3, 1
"""


def test_parse_and_convert(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from inp_to_vtu import convert_inp_to_vtu, parse_inp

    inp = tmp_path / "model.inp"
    inp.write_text(INP_SAMPLE)

    points, blocks, elsets = parse_inp(str(inp))
    assert points.shape == (10, 3)
    assert [b["abq"] for b in blocks] == ["C3D8", "C3D4", "T3D2"]
    assert elsets["tets"] == {2, 3}
    assert elsets["range_set"] == {1, 2, 3}
    assert elsets["solid"] == {1}
    assert elsets["rods"] == {4}
    # 0-based connectivity
    np.testing.assert_array_equal(blocks[0]["conn"][0],
                                  [0, 1, 2, 3, 4, 5, 6, 7])

    out = convert_inp_to_vtu(str(inp))
    data = read_vtu(out)
    assert data.points.shape == (10, 3)
    assert list(data.types) == [12, 10, 10, 3]
    np.testing.assert_array_equal(data.offsets, [8, 12, 16, 18])
    assert "elset_id" in data.cell_data
    assert "element_id" in data.cell_data


def test_continuation_lines(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from inp_to_vtu import parse_inp

    inp = tmp_path / "cont.inp"
    inp.write_text(
        "*NODE\n"
        + "\n".join(f"{i}, {float(i)}, 0, 0" for i in range(1, 21))
        + "\n*ELEMENT, TYPE=C3D20\n"
        + "1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,\n"
        + "11, 12, 13, 14, 15, 16, 17, 18, 19, 20\n"
    )
    points, blocks, _ = parse_inp(str(inp))
    assert blocks[0]["conn"].shape == (1, 20)
    assert blocks[0]["vtk_type"] == 25


QUADRATIC_INP = """** quadratic / truss catalogue (reference InpToVtu.jl:43-55)
*NODE
""" + "\n".join(
    f"{i}, {float(i)}, {float(i % 3)}, {float(i % 5)}" for i in range(1, 16)
) + """
*ELEMENT, TYPE=C3D15
1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
*ELEMENT, TYPE=S6
2, 1, 2, 3, 7, 8, 9
*ELEMENT, TYPE=S8R
3, 1, 2, 3, 4, 7, 8, 9, 10
*ELEMENT, TYPE=T3D3
4, 1, 2, 7
"""


def test_quadratic_element_catalogue(tmp_path):
    """C3D15/S6/S8/T3D3 map to VTK 26/22/23/21 (InpToVtu.jl:43-55)."""
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from inp_to_vtu import convert_inp_to_vtu, parse_inp

    inp = tmp_path / "quad.inp"
    inp.write_text(QUADRATIC_INP)
    points, blocks, _ = parse_inp(str(inp))
    assert [(b["abq"], b["vtk_type"], b["nn"]) for b in blocks] == [
        ("C3D15", 26, 15), ("S6", 22, 6), ("S8R", 23, 8), ("T3D3", 21, 3)]

    out = convert_inp_to_vtu(str(inp))
    data = read_vtu(out)
    assert list(data.types) == [26, 22, 23, 21]
    np.testing.assert_array_equal(data.offsets, [15, 21, 29, 32])
    # Abaqus ordering passes through 1:1 (0-based)
    np.testing.assert_array_equal(data.connectivity[:15], np.arange(15))
