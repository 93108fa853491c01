"""Material table and packing tests (reference GEN_MATERIALS.rs parity)."""

import numpy as np

from raytrace_tpu.materials import (
    ALBEDO_TABLE,
    MATERIALS,
    PACKED_MATERIALS,
    Material,
    unpack_albedo_np,
)


def test_table_matches_reference_values():
    # Values from the generated reference table (GEN_MATERIALS.rs:70-106).
    expect = [
        ((0, 0, 0), (0, 0, 0), False),
        ((127, 0, 127), (0, 0, 0), True),
        ((39, 110, 61), (0, 0, 0), True),
        ((51, 38, 25), (320, 154, 76), True),
        ((51, 51, 51), (0, 0, 0), True),
        ((62, 27, 22), (0, 0, 0), True),
        ((110, 116, 115), (0, 0, 0), True),
    ]
    assert len(MATERIALS) == 7
    for m, (albedo, emission, solid) in zip(MATERIALS, expect):
        assert m.albedo == albedo
        assert m.emission == emission
        assert m.solid == solid


def test_pack_layout():
    # (solid << 15) | (r << 14) | (g << 7) | b  (GEN_MATERIALS.rs:44-51).
    m = Material((1, 2, 3), (0, 0, 0), True)
    assert m.pack() == (1 << 15) | (1 << 14) | (2 << 7) | 3


def test_solid_bit_overlaps_albedo_r():
    # Documented quirk: bit 15 is both the solid flag and albedo_r bit 1.
    m = Material((127, 0, 0), (0, 0, 0), False)
    unpacked = Material.unpack(m.pack())
    assert unpacked.solid  # albedo_r's bit 1 reads back as solid

def test_unpack_drops_emission():
    m = MATERIALS[3]
    assert m.emission != (0, 0, 0)
    assert Material.unpack(m.pack()).emission == (0, 0, 0)


def test_roundtrip_albedo():
    for m in MATERIALS:
        u = Material.unpack(m.pack())
        assert u.albedo == m.albedo


def test_vectorized_unpack_matches_scalar():
    packed = PACKED_MATERIALS
    alb = unpack_albedo_np(packed)
    for i, m in enumerate(MATERIALS):
        np.testing.assert_allclose(alb[i], np.array(m.albedo) / 127.0, atol=1e-6)
    np.testing.assert_allclose(alb, ALBEDO_TABLE, atol=1e-6)


def test_material_code_check_trips_on_solid_edit(monkeypatch):
    """A materials.csv edit that breaks the fused kernel's 2-bit code table
    must fail loudly (VERDICT r1 weak #8)."""
    import pytest

    from raytrace_tpu import materials
    from raytrace_tpu.ops import lighting_pallas as lp

    bad = materials.SOLID_TABLE.copy()
    bad[5] = False
    monkeypatch.setattr(materials, "SOLID_TABLE", bad)
    monkeypatch.setattr(lp, "_MAT_CODES_CHECKED", False)
    with pytest.raises(AssertionError, match="no longer solid"):
        lp.check_material_codes()


def test_material_code_check_passes_on_real_table():
    from raytrace_tpu.ops import lighting_pallas as lp

    lp._MAT_CODES_CHECKED = False
    lp.check_material_codes()
    assert lp._MAT_CODES_CHECKED
