"""Frame pipeline: orchestrates streaming, tracing, denoising, finalize.

Reference: src/render/pipeline/pipeline.rs.  The reference records Vulkan
command buffers per swapchain image and fences one frame deep; on TPU the
entire frame — path trace, 6 denoise passes, finalize — is ONE jitted XLA
program (`render_frame`), and frame pipelining comes for free from JAX's
async dispatch: `draw_frame` returns a device array future without blocking
the host.

Uniform note: the reference's uniform block carries old_origin /
old_transform_c* reprojection fields (structs.rs:17-24) that the shader
never reads; they are tracked here (FrameUniforms.old_*) for API parity but
do not feed the kernels.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    BLUE_NOISE_SIZE,
    DEFAULT_HEIGHT,
    DEFAULT_WIDTH,
    MAX_TRACE_STEPS,
)
from ..ops.trace_jax import render_gbuffers
from ..utils.blue_noise import get_blue_noise_f32
from .camera import Camera
from .streaming import TerrainStreamer


@dataclasses.dataclass
class FrameUniforms:
    """Per-frame uniform state (reference structs.rs:5-31 + pipeline.rs:195-227)."""

    sun_angle: float = 0.0
    seed: int = 0
    origin: tuple = (0.0, 0.0, 0.0)
    forward: tuple = (0.0, 1.0, 0.0)
    up: tuple = (0.0, 0.0, 0.4)
    right: tuple = (0.4, 0.0, 0.0)
    old_origin: tuple = (0.0, 0.0, 0.0)
    old_transform: tuple = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    lr: tuple = (0, 0, 0)

    def as_device_dict(self) -> dict:
        return dict(
            origin=jnp.asarray(self.origin, jnp.float32),
            forward=jnp.asarray(self.forward, jnp.float32),
            up=jnp.asarray(self.up, jnp.float32),
            right=jnp.asarray(self.right, jnp.float32),
            sun_angle=jnp.float32(self.sun_angle),
            seed=jnp.int32(self.seed),
            lr=jnp.asarray(self.lr, jnp.float32),
        )


def render_frame(
    world,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int = DEFAULT_WIDTH,
    height: int = DEFAULT_HEIGHT,
    max_steps: int = MAX_TRACE_STEPS,
    with_gbuffers: bool = False,
    tracer: str = "volume",
    seed: int = 0,
    bounces: int = 2,
):
    """Dispatch to the jitted frame program, raising XLA's scoped-vmem
    limit only for frames big enough to run the striped denoise chain
    (denoise_pallas.scoped_vmem_options) — the hot <=1024² program keeps
    default compiler options."""
    from ..ops.denoise_pallas import scoped_vmem_options

    impl = (
        _render_frame_scoped
        if scoped_vmem_options(height, width)
        else _render_frame_default
    )
    return impl(
        world, blue_noise, uniforms, width, height, max_steps,
        with_gbuffers, tracer, seed, bounces,
    )


def _render_frame_impl(
    world,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    max_steps: int,
    with_gbuffers: bool,
    tracer: str,
    seed: int,
    bounces: int = 2,
):
    """Trace + denoise + finalize as one fused device program.

    `world` is the fused u32 volume for tracer="volume" (exact reference
    DDA, slow), a (fused_volume, build_vol_tables dict) pair for
    tracer="volume_fast" (brick-pyramid general path — renders arbitrary
    volume content at speed), or the build_hf_tables dict for tracer="hf" /
    "fused" (Pallas heightfield hot paths for the procedural world).
    Returns the final (H, W, 3) float32 frame, plus the raw G-buffer dict if
    requested.
    """
    if tracer == "fused":
        from ..ops.lighting_pallas import render_gbuffers_fused

        gb = render_gbuffers_fused(
            world, blue_noise, uniforms, width, height, max_steps, seed,
            unified=bool(int(os.environ.get("RAYTRACE_TPU_UNIFIED", "1"))),
            bounces=bounces,
        )
    elif tracer == "volume_fast":
        from ..ops.path_vol import render_gbuffers_path

        fused_flat, vol_tables = world
        gb = render_gbuffers_path(
            fused_flat, vol_tables, blue_noise, uniforms, width, height,
            max_steps, bounces=bounces,
        )
    elif tracer == "hf":
        from ..ops.trace_pallas import render_gbuffers_hf

        gb = render_gbuffers_hf(
            world, blue_noise, uniforms, width, height, max_steps, seed,
            bounces=bounces,
        )
    else:
        gb = render_gbuffers(
            world, blue_noise, uniforms, width, height, max_steps,
            bounces=bounces,
        )
    from ..ops.denoise_pallas import denoise_finalize_pallas

    # VMEM-resident Pallas denoiser with finalize fused into the last pass
    # (falls back to the XLA chain internally above its VMEM pixel budget).
    frame = denoise_finalize_pallas(gb, blue_noise)
    if with_gbuffers:
        return frame, gb
    return frame


_RF_STATICS = (
    "width", "height", "max_steps", "with_gbuffers", "tracer", "seed",
    "bounces",
)
from ..ops.denoise_pallas import SCOPED_VMEM_OPTIONS as _SCOPED_VMEM
# jit instances are created lazily: jax.jit with compiler_options
# initializes the backend eagerly, which must not happen at import time
# (the axon tunnel may not be up yet).
_jit_cache: dict = {}


def _lazy_jit(key, fun, statics, scoped):
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            fun,
            static_argnames=statics,
            compiler_options=_SCOPED_VMEM if scoped else None,
        )
    return _jit_cache[key]


def _render_frame_default(*a):
    return _lazy_jit("rf0", _render_frame_impl, _RF_STATICS, False)(*a)


def _render_frame_scoped(*a):
    return _lazy_jit("rf1", _render_frame_impl, _RF_STATICS, True)(*a)


def _render_frame_fused_packed(
    blue_noise: jax.Array,
    packed: jax.Array,
    width: int,
    height: int,
    max_steps: int,
    seed: int,
    bounces: int = 2,
):
    from ..ops.denoise_pallas import scoped_vmem_options

    impl = (
        _rffp_scoped if scoped_vmem_options(height, width) else _rffp_default
    )
    return impl(blue_noise, packed, width, height, max_steps, seed, bounces)


def _rffp_impl(
    blue_noise: jax.Array,
    packed: jax.Array,
    width: int,
    height: int,
    max_steps: int,
    seed: int,
    bounces: int = 2,
):
    """The interactive fast path: ONE host->device transfer per frame.

    `packed` is a (16,) f32 vector (origin 0:3, forward 3:6, up 6:9,
    right 9:12, sun 12, frame-seed 13, lr.x 14, lr.z 15; lr.y is always 0
    — the streamer never recenters along Y, pipeline.rs:175-179).  The
    heightfield tables are rebuilt INSIDE the frame program (~0.2 ms of
    VPU work) instead of by a separate host-triggered dispatch on region
    moves, so a slice crossing causes no frame hitch and the whole frame
    is a single dispatch through the tunnel.
    """
    from ..ops.lighting_pallas import render_gbuffers_fused
    from ..ops.trace_pallas import build_hf_tables

    lr = jnp.stack([packed[14], jnp.float32(0.0), packed[15]])
    uniforms = dict(
        origin=packed[0:3],
        forward=packed[3:6],
        up=packed[6:9],
        right=packed[9:12],
        sun_angle=packed[12],
        seed=packed[13].astype(jnp.int32),
        lr=lr,
    )
    tables = build_hf_tables(lr.astype(jnp.int32), seed=seed)
    gb = render_gbuffers_fused(
        tables, blue_noise, uniforms, width, height, max_steps, seed,
        unified=bool(int(os.environ.get("RAYTRACE_TPU_UNIFIED", "1"))),
        bounces=bounces,
    )
    from ..ops.denoise_pallas import denoise_finalize_pallas

    return denoise_finalize_pallas(gb, blue_noise)


_RFFP_STATICS = ("width", "height", "max_steps", "seed", "bounces")


def _rffp_default(*a):
    return _lazy_jit("fp0", _rffp_impl, _RFFP_STATICS, False)(*a)


def _rffp_scoped(*a):
    return _lazy_jit("fp1", _rffp_impl, _RFFP_STATICS, True)(*a)


class Pipeline:
    """Stateful frame loop: streaming + uniforms + the jitted frame program."""

    def __init__(
        self,
        width: int = DEFAULT_WIDTH,
        height: int = DEFAULT_HEIGHT,
        seed: int = 0,
        max_steps: int = MAX_TRACE_STEPS,
        source: str = "device",
        storage=None,
        tracer: str | None = None,
        preloaded_volume=None,
        validate: bool | None = None,
        bounces: int = 2,
    ):
        """tracer: "hf" (Pallas heightfield kernel, the fast path for
        generated worlds), "fused" (single-launch whole-path kernel),
        "volume_fast" (brick-pyramid general path: renders whatever is in
        the streamed volume — loaded or edited content — at speed) or
        "volume" (exact reference fused-volume DDA, slow).
        preloaded_volume: optional fused u32 volume to skip initial
        generation (tests, resumed sessions).  With tracer=None (the
        default) a preloaded volume selects "volume_fast" — the
        heightfield tracers re-derive the procedural world and would
        silently ignore the preloaded content; pass tracer="fused"
        explicitly to use a preloaded volume only as a generation cache.
        validate: per-frame finite checks + step-limiter pixel counts, the
        analog of the reference's debug-build-only Vulkan validation layers
        (constants.rs:11, debug.rs) and REPORT_ERROR pink pixels
        (raytrace.comp:5-7).  Forces a sync per frame — debug builds only.
        Defaults to the RAYTRACE_TPU_VALIDATE env var.
        bounces: light-path depth, 0-2 (reference ships 2,
        raytrace.comp:320-350).  bounces=1 is the interactive preset — 3
        rays/pixel instead of 5; the denoiser is the visual floor anyway."""
        if tracer is None:
            tracer = "volume_fast" if preloaded_volume is not None else "fused"
        assert tracer in ("hf", "fused", "volume", "volume_fast")
        if validate is None:
            validate = bool(int(os.environ.get("RAYTRACE_TPU_VALIDATE", "0")))
        self.validate = validate
        self.width = width
        self.height = height
        self.max_steps = max_steps
        self.seed = seed
        self.tracer = tracer
        self.bounces = bounces
        self.uniforms = FrameUniforms()
        self.streamer = TerrainStreamer(seed=seed, source=source, storage=storage)
        self.streamer.initialize(volume=preloaded_volume)
        self.blue_noise = jnp.asarray(get_blue_noise_f32())
        self._hf_tables = None
        self._hf_lr = None
        self._vol_tables = None
        self._vol_tables_for = None  # volume identity the tables match

    def teleport(self, camera: Camera) -> None:
        """Instantly recenter the world region on the camera (capture /
        spawn); regular per-frame streaming handles the residual drift."""
        self.streamer.teleport((camera.origin[0], 0.0, camera.origin[2]))
        self._hf_lr = None  # invalidate heightfield tables
        # Drain any residual sub-slice drift so the next frame is centered.
        self.converge_streaming(
            (camera.origin[0], 0, camera.origin[2]), max_moves=8
        )

    def edit_box(self, world_min, shape, material_id=None) -> None:
        """Edit the live world: write a solid material box (or carve air
        with material_id=None) into the resident volume at world-voxel
        ``world_min``/``shape`` (x, y, z).  Exact for both volume tracers
        (solidity + repaired minefield, world/edit.py); the occupancy
        tables rebuild automatically on the next frame.  The heightfield
        tracers ("hf"/"fused") derive their tables from worldgen, not the
        volume, and cannot display edits — render edits with
        tracer="volume_fast" (fast) or "volume" (exact-DDA)."""
        if self.tracer in ("hf", "fused"):
            raise ValueError(
                f"tracer={self.tracer!r} renders from worldgen-derived "
                "heightfields and cannot display volume edits; use "
                "tracer='volume_fast'"
            )
        self.streamer.edit_box(world_min, shape, material_id)

    def converge_streaming(self, target, max_moves: int = 32) -> None:
        """Drive the streamer's move_towards loop to its fixed point: the
        single request-one-slice step draw_frame performs each frame,
        repeated until no request is pending (at most max_moves).  Used by
        teleport and by benchmark warmups that must converge the region
        without paying a draw_frame compile."""
        for _ in range(max_moves):
            self.streamer.request_move_towards(target)
            if not self.streamer.setup_next_request():
                break

    def fill_uniforms(
        self, camera: Camera, sun_angle: float, bump_seed: bool = True
    ) -> None:
        """The per-frame uniform fill draw_frame performs
        (pipeline.rs:198-210).  bump_seed=False for callers that manage
        the noise seed themselves (benchmark frame programs)."""
        forward, up, right = camera.scaled_basis()
        u = self.uniforms
        u.origin = tuple(camera.origin)
        u.forward, u.up, u.right = forward, up, right
        if bump_seed:
            u.seed = (u.seed + 1) % BLUE_NOISE_SIZE
        u.sun_angle = sun_angle
        u.lr = self.streamer.get_render_offset()

    def draw_frame(self, camera: Camera, sun_angle: float) -> jax.Array:
        """One frame: stream one slice toward the camera, then render.

        Matches draw_frame ordering (pipeline.rs:134-235): terrain move
        request uses (x, 0, z) — the reference never recenters along Y
        (pipeline.rs:175-179) — then uniforms update, then submit.
        """
        self.streamer.request_move_towards((camera.origin[0], 0, camera.origin[2]))
        self.streamer.setup_next_request()

        self.fill_uniforms(camera, sun_angle)
        u = self.uniforms

        if self.tracer == "fused" and not self.validate:
            # Interactive fast path: one packed upload, one dispatch; the
            # table rebuild rides inside the frame program.
            assert u.lr[1] == 0, u.lr  # streamer never recenters along Y
            packed = np.array(
                [*u.origin, *u.forward, *u.up, *u.right, u.sun_angle,
                 float(u.seed), float(u.lr[0]), float(u.lr[2])],
                np.float32,
            )
            frame = _render_frame_fused_packed(
                self.blue_noise, jnp.asarray(packed),
                self.width, self.height, self.max_steps, self.seed,
                self.bounces,
            )
            u.old_origin = u.origin
            u.old_transform = _invert3(
                tuple(zip(*(u.right, u.up, u.forward)))
            )
            return frame

        if self.tracer in ("hf", "fused"):
            from ..ops.trace_pallas import build_hf_tables

            if self._hf_lr != u.lr:
                self._hf_tables = build_hf_tables(
                    jnp.asarray(u.lr, jnp.int32), seed=self.seed
                )
                self._hf_lr = u.lr
            world = self._hf_tables
        elif self.tracer == "volume_fast":
            # The occupancy pyramid is a derived acceleration structure:
            # refresh whenever streaming replaced the volume array (every
            # update produces a new donated array object).  Streamed slab
            # writes refresh incrementally (only the touched brick planes,
            # ~16x less work than a rebuild — the analog of the reference
            # uploading its minefield WITH the slice, terrain_upload.rs);
            # initialize/teleport invalidate the log and rebuild fully.
            if self._vol_tables_for is not self.streamer.volume:
                from ..ops.trace_vol_pallas import (
                    build_vol_tables,
                    update_vol_tables,
                )

                log = self.streamer.drain_slab_log()
                if self._vol_tables is not None and log is not None:
                    for arr_axis, t0 in log:
                        self._vol_tables = update_vol_tables(
                            self._vol_tables, self.streamer.volume, t0,
                            arr_axis,
                        )
                else:
                    self._vol_tables = build_vol_tables(self.streamer.volume)
                self._vol_tables_for = self.streamer.volume
            world = (self.streamer.volume, self._vol_tables)
        else:
            world = self.streamer.volume

        if self.validate:
            frame, gb = render_frame(
                world,
                self.blue_noise,
                u.as_device_dict(),
                self.width,
                self.height,
                self.max_steps,
                with_gbuffers=True,
                tracer=self.tracer,
                seed=self.seed,
                bounces=self.bounces,
            )
            self._validate_frame(frame, gb)
        else:
            frame = render_frame(
                world,
                self.blue_noise,
                u.as_device_dict(),
                self.width,
                self.height,
                self.max_steps,
                tracer=self.tracer,
                seed=self.seed,
                bounces=self.bounces,
            )

        # Post-submit reprojection bookkeeping (pipeline.rs:214-227).
        u.old_origin = u.origin
        u.old_transform = _invert3(
            tuple(zip(*(u.right, u.up, u.forward)))  # columns r,u,f
        )
        return frame

    def _validate_frame(self, frame, gb) -> None:
        """Debug-mode frame checks (the validation-layer analog).

        Reference behavior being mirrored: Vulkan validation messengers run
        only in debug builds and print colored severity-tagged diagnostics
        (debug.rs:52-110); the in-kernel step limiter highlights exhausted
        rays pink (raytrace.comp:5-7,387-400).  Here: non-finite pixels and
        limiter-hit counts are reported to stdout; synchronous by design.
        """
        f = np.asarray(frame)
        bad = int((~np.isfinite(f)).sum())
        if bad:
            print(f"[validate] {bad} non-finite frame values")
        depth = np.asarray(gb["depth"])
        exhausted = int((depth == 256 * 254).sum())
        if exhausted:
            print(
                f"[validate] {exhausted} rays hit the {self.max_steps}-step "
                "limiter (pink error pixels)"
            )
        light = np.asarray(gb["lighting"])
        if not np.isfinite(light).all():
            print("[validate] non-finite lighting buffer values")


def _invert3(m):
    """Inverse of a 3x3 matrix given as rows; plain python floats."""
    a = np.array(m, np.float64)
    return tuple(tuple(row) for row in np.linalg.inv(a).astype(np.float32))
