"""Wavefront path-tracing integrator.

TPU-native re-architecture of the reference's recursive ``ray_color``
(reference: raytracer/src/main.rs:233-278): the depth-50 recursion becomes a
fixed-length ``lax.scan`` over live-ray SoA buffers with masking.  Per
bounce: closest-hit -> emitted -> scatter -> mixture-PDF sample -> update
throughput/radiance.  Accumulating ``radiance += throughput * emitted`` at
each vertex is algebraically identical to the reference's recursive form.

Faithful semantic details:
  * specular branch returns ``attenuation * L(next)`` WITHOUT adding
    emitted (main.rs:246-249) — we add emitted only on the diffuse and
    absorb branches;
  * mixture PDF = 50/50 light-list / cosine (pdf.rs:95-104), with the light
    pdf's extra geometry queries (aarect.rs:74-83, sphere.rs:75-83);
  * t_min = 0.001 (main.rs:243); scattered rays keep the incoming time
    except metal which zeroes it (material/mod.rs:92);
  * rays whose mixture pdf is 0 are killed with their radiance kept —
    the reference produces a NaN sample there that blackens the whole pixel
    at write_color (main.rs:284-292); killing is the sane equivalent and
    differs only in rare pathological samples;
  * scatter origins are offset along the face normal by a relative epsilon
    (``spawn_eps``) because we run f32 where the reference runs f64 — with
    eps=0 the behavior is exactly the reference's.

The whole loop is differentiable w.r.t. material/texture tables and camera;
discrete decisions (hit selection, specular branch choice, light pick) are
naturally piecewise-constant, and sampling uses reparameterized directions,
so autodiff yields the correct reparameterized path-replay gradients for
continuous params.  ``jax.checkpoint`` on the bounce body keeps backward
memory at O(one bounce).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.intersect import closest_hit
from ..ops.lights import lights_pdf, sample_lights
from ..ops.materials import emitted, scatter, scattering_pdf_lambertian, texture_value
from ..ops.sampling import cos_pdf_value, cosine_about_normal
from ..ops.vecmath import dot, scale, to_unit, vec3
from ..scene.types import ISOTROPIC, LAMBERTIAN, SceneData


class TraceConfig(NamedTuple):
    max_depth: int = 50
    background: Optional[tuple] = (0.0, 0.0, 0.0)  # None => book1/2 sky gradient
    t_min: float = 1e-3
    spawn_eps: float = 1e-4  # relative origin offset (f32 robustness); 0 = off
    # Per-bounce coherence sort of the wavefront (ops/sort.py).  Off by
    # default: measured on TPU v5e, lax.sort costs ~26 ms per 131k-lane
    # bounce (6 payload rows) — more than the traversal time it saves on
    # every scene in the library.  The hook stays for workloads with much
    # deeper mesh trees where coherence is worth that price.
    sort_rays: bool = False
    unroll: bool = False  # python-loop the bounces (debugging / small depths)


def _background(cfg: TraceConfig, d):
    if cfg.background is not None:
        c = jnp.asarray(cfg.background, dtype=jnp.float32)
        return jnp.broadcast_to(c[:, None], d.shape)
    # classic RTiOW sky gradient used by the book1/book2 golden images
    unit_d = to_unit(d)
    tt = 0.5 * (unit_d[1] + 1.0)
    white = vec3(jnp.ones_like(tt), jnp.ones_like(tt), jnp.ones_like(tt))
    blue = vec3(0.5 * jnp.ones_like(tt), 0.7 * jnp.ones_like(tt), jnp.ones_like(tt))
    return scale(white, 1.0 - tt) + scale(blue, tt)


class _Vertex(NamedTuple):
    """Result of evaluating one path vertex for the whole wavefront."""

    radiance_add: jnp.ndarray  # (3, N) throughput-weighted contribution
    cont: jnp.ndarray  # bool[N] path continues
    o: jnp.ndarray  # next ray (valid where cont)
    d: jnp.ndarray
    tm: jnp.ndarray
    throughput: jnp.ndarray  # updated throughput (valid where cont)


def _eval_vertex(
    scene: SceneData,
    cfg: TraceConfig,
    o,
    d,
    tm,
    throughput,
    alive,
    bounce_key,
    use_pallas: bool = False,
    recompute_t: bool = True,
) -> _Vertex:
    """One path vertex: closest-hit -> emitted -> scatter -> MIS sample.

    Shared by the scan integrator (differentiable) and the regeneration
    integrator (fast forward, ``use_pallas``).  Semantics follow ray_color
    exactly (main.rs:233-278); see the module docstring for details.
    """
    n = tm.shape[0]
    features = scene.stats.features
    has_lights = len(scene.stats.light_ids) > 0
    k_hit, k_scatter, k_mix, k_light, k_cos = jax.random.split(bounce_key, 5)

    # Dead lanes' stale rays must not pay for traversal: park them far
    # outside every AABB so packet/cluster walks reject them at the root.
    # (Every output of this function is already masked by ``alive``; this
    # only removes the WORK those lanes caused.  Low-occupancy tail
    # iterations of the regen schedulers get proportionally cheap.)
    # 1e6 — beyond any library scene's bounds — NOT 1e30: the parked
    # origin is squared in the sphere quadratic, and an inf there makes
    # NaN primals whose zero-masked cotangents still poison reverse-mode
    # (NaN * 0) through the differentiable integrators.
    o = jnp.where(alive[None], o, 1e6)
    d = jnp.where(alive[None], d, 1.0)

    hit, shade = closest_hit(
        scene,
        o,
        d,
        tm,
        cfg.t_min,
        jnp.inf,
        k_hit,
        use_pallas=use_pallas,
        recompute_t=recompute_t,
    )
    tex_val = texture_value(scene.textures, shade, hit, features)
    em = emitted(shade, hit, tex_val)
    sc = scatter(shade, hit, tex_val, d, tm, k_scatter)

    # --- diffuse branch: 50/50 mixture of light-sample and cosine
    # (main.rs:263-266, pdf.rs:95-104)
    cos_dir = cosine_about_normal(k_cos, hit.normal)
    if has_lights:
        light_dir = sample_lights(scene, hit.p, k_light)
        pick_light = jax.random.uniform(k_mix, (n,)) < 0.5
        new_dir = jnp.where(pick_light[None], light_dir, cos_dir)
        pdf_val = 0.5 * lights_pdf(scene, hit.p, new_dir, tm) + 0.5 * cos_pdf_value(
            new_dir, to_unit(hit.normal)
        )
    else:
        # lightless configs (book1/book2): pure cosine importance
        # sampling — the books' original integrator; the frozen
        # reference main cannot render these scenes at all (empty
        # lights list panics), see SURVEY.md §7 step 5.
        new_dir = cos_dir
        pdf_val = cos_pdf_value(new_dir, to_unit(hit.normal))

    spdf = scattering_pdf_lambertian(hit.normal, new_dir)
    lamb = shade.mat_kind == LAMBERTIAN

    # --- classify
    miss = alive & ~hit.hit
    absorb = alive & hit.hit & ~sc.has_scatter
    specular = alive & hit.hit & sc.has_scatter & sc.is_specular
    diffuse = alive & hit.hit & sc.has_scatter & ~sc.is_specular & lamb
    # pdf <= 0 or NaN (the reference gets a NaN sample that blackens the
    # whole pixel at write_color; we kill the sample, keeping its
    # radiance so far — see module docstring)
    pdf_ok = pdf_val > 0.0  # NaN compares False
    diffuse = diffuse & pdf_ok

    # --- radiance: background on miss; emitted on absorb/diffuse
    radiance_add = jnp.where(miss[None], throughput * _background(cfg, d), 0.0)
    radiance_add = radiance_add + jnp.where(
        (absorb | diffuse)[None], throughput * em, 0.0
    )

    # --- throughput update (safe divisor on non-diffuse lanes)
    w_diffuse = sc.attenuation * (spdf / jnp.where(diffuse & pdf_ok, pdf_val, 1.0))[None]
    throughput = jnp.where(
        specular[None],
        throughput * sc.attenuation,
        jnp.where(diffuse[None], throughput * w_diffuse, throughput),
    )

    # --- next ray
    next_dir = jnp.where(specular[None], sc.spec_dir, new_dir)
    next_tm = jnp.where(specular, sc.spec_time, tm)
    # origin offset along the face normal, signed toward the outgoing
    # side; skipped for medium scatters (their "normal" is synthetic)
    if cfg.spawn_eps > 0.0:
        is_surface = shade.mat_kind != ISOTROPIC
        eps = cfg.spawn_eps * jnp.maximum(1.0, jnp.max(jnp.abs(hit.p), axis=0))
        side = jnp.sign(dot(hit.normal, next_dir))
        offset = scale(hit.normal, eps * side * is_surface.astype(jnp.float32))
        new_o = hit.p + offset
    else:
        new_o = hit.p

    return _Vertex(
        radiance_add=radiance_add,
        cont=specular | diffuse,
        o=new_o,
        d=next_dir,
        tm=next_tm,
        throughput=throughput,
    )


def trace(
    scene: SceneData,
    o: jnp.ndarray,  # (3, N)
    d: jnp.ndarray,  # (3, N)
    tm: jnp.ndarray,  # (N,)
    key,
    cfg: TraceConfig,
) -> jnp.ndarray:
    """Trace a wavefront to completion -> radiance (3, N).

    Fixed-depth ``lax.scan``: reverse-differentiable (the fit path), at the
    cost of running every bounce at full wavefront width.  For forward-only
    rendering :func:`trace_regen` is substantially faster.
    """
    n = tm.shape[0]

    def bounce(carry, bounce_key):
        o, d, tm, throughput, radiance, alive = carry
        vx = _eval_vertex(scene, cfg, o, d, tm, throughput, alive, bounce_key)
        radiance = radiance + vx.radiance_add  # already masked by `alive`
        cont = vx.cont
        o_out = jnp.where(cont[None], vx.o, o)
        d_out = jnp.where(cont[None], vx.d, d)
        tm_out = jnp.where(cont, vx.tm, tm)
        throughput = jnp.where(cont[None], vx.throughput, throughput)
        return (o_out, d_out, tm_out, throughput, radiance, cont), None

    zeros3 = jnp.zeros((3, n))
    carry = (o, d, tm, jnp.ones((3, n)), zeros3, jnp.ones((n,), dtype=bool))
    bounce_keys = jax.random.split(key, cfg.max_depth)
    if cfg.unroll:
        for i in range(cfg.max_depth):
            carry, _ = bounce(carry, bounce_keys[i])
    else:
        carry, _ = jax.lax.scan(jax.checkpoint(bounce), carry, bounce_keys)
    _, _, _, _, radiance, _ = carry
    return radiance


def _pool_reserve(want, remaining, spp_par: int):
    """Reserve pooled samples for lanes that want work.

    Lanes are pixel-STRIDED (lane l belongs to pixel l % n_pix, so the
    ``(spp_par, n_pix)`` view keeps pixels in the 128-wide TPU lane
    dimension — a pixel-contiguous layout would put tiny ``spp_par`` there
    and run every pooling op at ~1/64 VPU efficiency, measured +0.26 ms per
    131k-lane iteration).  Each pixel owns a pool counter ``remaining[HW]``;
    an exclusive cumsum over the short spp_par axis ranks this iteration's
    requesters and grants the first ``remaining`` of them — an O(N)
    branchless reservation with no scatter.  Returns ``(start bool[N],
    remaining')``.
    """
    wantm = want.reshape(spp_par, -1)  # (spp_par, n_pix), pixels lane-major
    rank = jnp.cumsum(wantm, axis=0) - wantm  # exclusive rank within pixel
    startm = wantm & (rank < remaining[None, :])
    remaining = remaining - jnp.sum(startm, axis=0, dtype=remaining.dtype)
    return startm.reshape(-1), remaining


def trace_regen(
    scene: SceneData,
    gen_rays,  # (sample_key, pix i32[N]) -> (o (3,N), d (3,N), tm (N,))
    pix0: jnp.ndarray,  # i32[N] initial lane -> pixel assignment
    spp_seq: int,  # samples per lane
    key,
    cfg: TraceConfig,
    return_iters: bool = False,
    spp_par: Optional[int] = None,  # lanes per pixel (enables pooling)
    pool=None,  # None: heuristic; True/False: global pool; "pixel": pixel pool
) -> jnp.ndarray:
    """Path-regeneration wavefront -> per-lane radiance SUM, grouped by
    pixel (lane l serves pixel l % n_pix unless noted below).

    TPU-native scheduling win over the fixed-depth scan: when a sample
    terminates (miss / absorbed / pdf-kill / depth cap) its lane immediately
    starts the next sample, so every iteration runs at ~full lane
    occupancy.  Total iterations ~= spp_seq * E[path length] instead of
    spp_seq * max_depth — typically 4-8x fewer vertex evaluations.  The
    per-sample estimator is IDENTICAL to :func:`trace` (same vertex math,
    same termination rules); only the schedule differs.

    **Global sample pool** (``spp_par`` given, the production path): the
    whole launch shares ONE pool of ``N * spp_seq`` samples; sample ``m``
    targets pixel ``m % n_pix``, and any lane that finishes (or sits idle)
    reserves the next undone sample via an exclusive cumsum over the
    wavefront.  Pixel-bound lanes make the wall clock the MAX over pixels
    of that pixel's total path length — measured occupancy on
    wwscene/final_scene was 12%, because a hard pixel's 50-bounce specular
    chains all queue on its own few lanes.  With the global pool,
    iterations concentrate at ``spp_seq * E[len]`` plus a short
    low-occupancy tail for the last paths in flight.

    Radiance never needs a scatter inside the loop: each lane deposits the
    finished sample's radiance at slot ``k`` (its own completed-sample
    count) of a ``(3, S_max, N)`` store via a one-hot over the small slot
    axis, and records the sample's pixel id in an ``(S_max, N)`` map; ONE
    ``segment_sum`` at the end regroups everything by pixel.  Any
    ``S_max > spp_seq`` cannot deadlock: lanes at the slot cap stop
    reserving, and the pool (``N*spp_seq`` samples) drains before all
    lanes could reach the cap; the chosen slack trades per-iteration
    deposit traffic against capped-lane idling.  Every reserved sample
    runs to completion, so per-pixel counts are exactly
    ``spp_par * spp_seq`` and the estimator is unchanged.

    When ``cfg.sort_rays`` and the scene has an acceleration structure, the
    wavefront is re-sorted by a coarse origin/direction key every bounce
    (ops/sort.py) so the block-shared cluster traversal stays coherent;
    lane migration breaks the slot bookkeeping, so the sort path keeps
    fixed lane->pixel quotas and carries pixel ids for the final
    regrouping sort.

    **Pixel pool** (``pool="pixel"``, r5): each pixel's
    ``spp_par * spp_seq`` samples are shared by that pixel's own
    ``spp_par`` lanes — per-lane radiance (no slot store at all) at ~2.7
    iterations/sample vs the quota schedule's ~3.5 max-over-lanes.  Best
    for scenes with uniform path lengths (cornell, random_scene), where
    launch depth becomes nearly free; heterogeneous scenes keep the
    global pool (a hard pixel would stall its own lanes).

    **Narrow drains** (r5, all three schedules): late iterations run at
    collapsing occupancy, so once the stragglers fit in N/4 they are
    compacted into a narrow wavefront and finished there — quota lanes
    keep regenerating until their quotas complete, and pixel-pool lanes
    carry their pixel's leftover pool as per-lane quotas, so per-pixel
    sample counts stay exactly ``spp_par * spp_seq`` in every mode.

    ``lax.while_loop`` exits when all work is done (phase A hands off to
    the drain at the N/4 threshold); this is forward-only (not
    reverse-differentiable) — the fit path uses :func:`trace_regen_diff`
    or :func:`trace`.
    """
    from ..ops.sort import ray_sort_key, sort_by_key

    n = pix0.shape[0]
    do_sort = cfg.sort_rays and scene.use_bvh and n >= 2048
    # Scheduler choice.  Global pooling pays a per-iteration deposit cost
    # proportional to the (3, S_max, N) store; the gate keeps it where it
    # wins.  Measured: heterogeneous scenes (wwscene/final at sq<=32) gain
    # 1.2-4x from pooling; cornell's cheap uniform bounces at sq=64 lose
    # 8x to the deposit.  The PIXEL pool ("pixel", r5) shares each pixel's
    # spp_par*spp_seq samples among that pixel's spp_par lanes — per-lane
    # radiance (no deposit store at all) at ~2.7 iters/sample vs the
    # quota schedule's 3.5 (max-over-lanes); at handoff the unserved
    # trickle becomes per-lane leftover quotas for the narrow drain, so
    # per-pixel counts stay exactly spp_par*spp_seq.
    if pool is None:
        pool = spp_seq <= 32 or "pixel"
    psched = spp_par is not None and not do_sort and pool == "pixel"
    sched = spp_par is not None and not do_sort and bool(pool) and not psched
    wb = scene.stats.world_bounds
    max_iter = (spp_seq + 1) * cfg.max_depth + 2  # hard safety bound

    if sched:
        n_pix = n // spp_par
        # slot capacity: N*s_max > N*spp_seq guarantees the pool drains
        # before every lane could cap out (no deadlock); the extra slack
        # trades deposit traffic against capped-lane idling
        s_max = 2 * spp_seq + 2 if spp_seq <= 16 else spp_seq + 8
        slot_iota = jnp.arange(s_max, dtype=jnp.int32)[:, None]  # (S_max, 1)
        pix_start = jnp.arange(n, dtype=jnp.int32) % n_pix  # samples 0..N-1
    elif psched:
        n_pix = n // spp_par
        pix_start = pix0
    else:
        pix_start = pix0

    o0, d0, tm0 = gen_rays(jax.random.fold_in(key, 0), pix_start)
    zeros3 = jnp.zeros((3, n))

    # Narrow drain phase: late iterations run at collapsing occupancy
    # while still paying full-width fixed costs — in pool mode once the
    # pool empties no lane ever regenerates (~max_depth such iterations
    # per launch); in quota mode the slowest lanes' remaining quotas
    # produce an even longer tail (the max-over-lanes of 64-sample length
    # sums, measured 225 vs 166 ideal iterations on cornell (2,64)).
    # Either way: compact the stragglers into an N/4 wavefront and finish
    # them there (quota lanes keep regenerating inside the drain).
    narrow = n >= 8192 and not do_sort
    n2 = n // 4 if narrow else n

    def cond(state):
        it = state[0]
        if sched:
            working, remaining = state[6][0], state[6][1]
            go = jnp.any(working) | (remaining > 0)
            if narrow:
                # hand off to the narrow phase once the pool is drained and
                # the survivors fit in the N/4 wavefront
                go &= (remaining > 0) | (jnp.sum(working) > n2)
        elif psched:
            # a lane idles only when its own pixel's pool is empty, so
            # any(alive) alone is a complete termination condition; with
            # narrow, hand off once the survivors fit in N/4 (the unserved
            # trickle rides along as leftover quotas)
            working = state[6][0]
            go = jnp.any(working)
            if narrow:
                go &= jnp.sum(working) > n2
        else:
            working_q = state[6] < spp_seq
            go = jnp.any(working_q)
            if narrow:
                # hand off once the lanes still owing quota fit in N/4
                go &= jnp.sum(working_q) > n2
        return (it < max_iter) & go

    def body(state):
        it, o, d, tm, throughput, radiance, work, depth, pix = state
        if sched:
            store, sample_rad, pix_map = radiance
            working, remaining, slots, drawn = work
        elif psched:
            working, remaining = work
        else:
            done = work
            working = done < spp_seq
        step_key = jax.random.fold_in(key, it + 1)
        k_vertex, k_regen = jax.random.split(step_key)

        vx = _eval_vertex(
            scene, cfg, o, d, tm, throughput, working, k_vertex,
            use_pallas=True, recompute_t=False,  # forward-only launch
        )

        depth = depth + 1
        cont = vx.cont & (depth < cfg.max_depth)  # depth cap = black tail
        finished = working & ~cont  # this sample just completed

        if sched:
            sample_rad = sample_rad + vx.radiance_add  # in-flight accumulation
            # deposit the finished sample at the lane's slot: a one-hot
            # broadcast-add over the small S_max axis.  (A unique-index
            # scatter would avoid rewriting the store, but TPU scatter
            # measured 3-5x SLOWER than this full-array add at S_max<=34;
            # the pool is therefore gated to small spp_seq upstream.)
            dep = (slot_iota == slots[None]) & finished[None]  # (S_max, N)
            store = store + sample_rad[:, None, :] * dep[None]
            slots = slots + finished.astype(slots.dtype)
            sample_rad = jnp.where(finished[None], 0.0, sample_rad)
            # reserve the next pool samples: idle or just-finished lanes
            # with slot room, granted in cumsum rank order
            want = (finished | ~working) & (slots < s_max)
            wanti = want.astype(jnp.int32)
            rank = jnp.cumsum(wanti) - wanti
            start = want & (rank < remaining)
            m = drawn + rank  # global sample index of the new sample
            pix = jnp.where(start, m % n_pix, pix)
            n_started = jnp.sum(start.astype(jnp.int32))
            # record the NEW sample's pixel at the lane's (advanced) slot
            rec = (slot_iota == slots[None]) & start[None]
            pix_map = jnp.where(rec, pix[None], pix_map)
            radiance = (store, sample_rad, pix_map)
            work = (cont | start, remaining - n_started, slots, drawn + n_started)
        elif psched:
            radiance = radiance + vx.radiance_add  # masked by `working`
            start, remaining = _pool_reserve(
                finished | ~working, remaining, spp_par
            )
            work = (cont | start, remaining)
        else:
            radiance = radiance + vx.radiance_add  # masked by `working`
            done = done + finished.astype(done.dtype)
            start = finished
            work = done

        # (re)generate lanes granted a new sample
        o_new, d_new, tm_new = gen_rays(k_regen, pix)
        regen = start[None]
        o = jnp.where(regen, o_new, jnp.where(cont[None], vx.o, o))
        d = jnp.where(regen, d_new, jnp.where(cont[None], vx.d, d))
        tm = jnp.where(start, tm_new, jnp.where(cont, vx.tm, tm))
        throughput = jnp.where(
            regen, 1.0, jnp.where(cont[None], vx.throughput, throughput)
        )
        depth = jnp.where(start, 0, depth)

        if do_sort:
            # re-pack neighboring lanes into coherent ray blocks; all
            # per-lane state rides the one fused sort as payload
            sort_key = ray_sort_key(o, d, wb[0], wb[1])
            (
                o0_, o1_, o2_, d0_, d1_, d2_, tm, th0, th1, th2,
                r0, r1, r2, donef, depth, pix,
            ) = sort_by_key(
                sort_key,
                (
                    o[0], o[1], o[2], d[0], d[1], d[2], tm,
                    throughput[0], throughput[1], throughput[2],
                    radiance[0], radiance[1], radiance[2],
                    work, depth, pix,
                ),
            )
            o = jnp.stack([o0_, o1_, o2_])
            d = jnp.stack([d0_, d1_, d2_])
            throughput = jnp.stack([th0, th1, th2])
            radiance = jnp.stack([r0, r1, r2])
            work = donef
        return (it + 1, o, d, tm, throughput, radiance, work, depth, pix)

    if sched:
        pix_map0 = jnp.full((s_max, n), n_pix, dtype=jnp.int32)
        pix_map0 = pix_map0.at[0].set(pix_start)  # slot-0: initial wavefront
        rad0 = (
            jnp.zeros((3, s_max, n)),  # deposited samples by (slot, lane)
            zeros3,  # in-flight sample radiance
            pix_map0,  # slot -> pixel id (sentinel n_pix = unused)
        )
        work0 = (
            jnp.ones((n,), dtype=bool),  # every lane starts in flight
            jnp.int32(n * (spp_seq - 1)),  # remaining pool
            jnp.zeros((n,), dtype=jnp.int32),  # completed-sample slots
            jnp.int32(n),  # samples drawn so far (initial wavefront)
        )
    elif psched:
        rad0 = zeros3
        work0 = (
            jnp.ones((n,), dtype=bool),  # every lane starts in flight
            jnp.full((n_pix,), spp_par * (spp_seq - 1), dtype=jnp.int32),
        )
    else:
        rad0 = zeros3
        work0 = jnp.zeros((n,), dtype=jnp.int32)

    state = (
        jnp.int32(0),
        o0,
        d0,
        tm0,
        jnp.ones((3, n)),
        rad0,
        work0,
        jnp.zeros((n,), dtype=jnp.int32),
        pix_start,
    )
    state = jax.lax.while_loop(cond, body, state)
    radiance, pix = state[5], state[8]
    if psched and narrow:
        # pixel-pool drain: the survivors (mid-flight lanes) compact into
        # an N/4 wavefront together with their pixels' LEFTOVER pool as
        # per-lane quotas — a pixel with remaining samples always has all
        # its lanes in flight (an idle lane with a nonempty pixel pool is
        # granted a sample the same iteration), so splitting remaining[p]
        # among p's alive lanes by rank loses nothing and keeps per-pixel
        # counts exactly spp_par * spp_seq.
        it_a, o, d, tm, throughput = state[0], state[1], state[2], state[3], state[4]
        alive, remaining = state[6]
        depth = state[7]
        alivem = alive.reshape(spp_par, n_pix)
        rank = jnp.cumsum(alivem, axis=0) - alivem  # rank among pixel's lanes
        k_al = jnp.maximum(jnp.sum(alivem, axis=0), 1)
        base = remaining // k_al
        extra = remaining % k_al
        need_m = jnp.where(alivem, base[None] + (rank < extra[None]), 0)
        need = need_m.reshape(-1).astype(jnp.int32)  # full samples after this one
        perm = jnp.argsort(~alive, stable=True)[:n2]

        def take(x):
            return jnp.take(x, perm, axis=-1)

        n3 = n // 16

        def cond_p(s):
            # hand off to the N/16 stage once the survivors fit there (a
            # lane goes dead only when it finishes with need == 0, so the
            # alive count is monotone and the handoff is sound)
            return (s[0] < max_iter) & (jnp.sum(s[7]) > n3)

        def body_p(s):
            it, o, d, tm, th, rad, need, al, dp, pixb = s
            k_vertex, k_regen = jax.random.split(jax.random.fold_in(key, it + 1))
            vx = _eval_vertex(
                scene, cfg, o, d, tm, th, al, k_vertex,
                use_pallas=True, recompute_t=False,  # forward-only drain
            )
            rad = rad + vx.radiance_add  # masked by `al`
            dp = dp + 1
            cont = vx.cont & (dp < cfg.max_depth)
            finished = al & ~cont
            start = finished & (need > 0)
            need = need - start.astype(need.dtype)
            o_new, d_new, tm_new = gen_rays(k_regen, pixb)
            rg = start[None]
            o = jnp.where(rg, o_new, jnp.where(cont[None], vx.o, o))
            d = jnp.where(rg, d_new, jnp.where(cont[None], vx.d, d))
            tm = jnp.where(start, tm_new, jnp.where(cont, vx.tm, tm))
            th = jnp.where(rg, 1.0, jnp.where(cont[None], vx.throughput, th))
            dp = jnp.where(start, 0, dp)
            return (it + 1, o, d, tm, th, rad, need, cont | start, dp, pixb)

        sp0 = (
            it_a,
            take(o),
            take(d),
            take(tm),
            take(throughput),
            take(radiance),
            take(need),
            take(alive),
            take(depth),
            take(pix),
        )
        sp0 = jax.lax.while_loop(cond_p, body_p, sp0)
        # cascade: compact the last stragglers (and their leftover quotas)
        # into N/16 and finish them there
        alive1 = sp0[7]
        perm2 = jnp.argsort(~alive1, stable=True)[:n3]

        def take2(x):
            return jnp.take(x, perm2, axis=-1)

        def cond_p2(s):
            return (s[0] < max_iter) & jnp.any(s[7])

        sp2 = (
            sp0[0],
            take2(sp0[1]),
            take2(sp0[2]),
            take2(sp0[3]),
            take2(sp0[4]),
            take2(sp0[5]),
            take2(sp0[6]),
            jnp.take(alive1, perm2),
            take2(sp0[8]),
            take2(sp0[9]),
        )
        sp2 = jax.lax.while_loop(cond_p2, body_p, sp2)
        rad1 = sp0[5].at[:, perm2].set(sp2[5])
        radiance = radiance.at[:, perm].set(rad1)
    if not sched and not psched and narrow:
        # quota drain: lanes still owing samples are compacted into an N/4
        # wavefront and run the SAME quota schedule there (regeneration
        # included) until every quota completes — per-pixel sample counts
        # stay exactly spp_par * spp_seq, only the width changes.  The
        # iteration counter rides the carry so the per-iteration RNG keys
        # continue phase A's sequence (no reuse).
        it_a, o, d, tm, throughput = state[0], state[1], state[2], state[3], state[4]
        done_q, depth = state[6], state[7]
        working = done_q < spp_seq
        perm = jnp.argsort(~working, stable=True)[:n2]

        def take(x):
            return jnp.take(x, perm, axis=-1)

        n3 = n // 16

        def cond_b(s):
            # hand off to the N/16 stage once the lanes still owing quota
            # fit there (done is monotone non-decreasing per lane)
            return (s[0] < max_iter) & (jnp.sum(s[6] < spp_seq) > n3)

        def body_b(s):
            it, o, d, tm, th, rad, done, dp, pixb = s
            k_vertex, k_regen = jax.random.split(jax.random.fold_in(key, it + 1))
            alive = done < spp_seq
            vx = _eval_vertex(
                scene, cfg, o, d, tm, th, alive, k_vertex,
                use_pallas=True, recompute_t=False,  # forward-only drain
            )
            rad = rad + vx.radiance_add  # masked by `alive`
            dp = dp + 1
            cont = vx.cont & (dp < cfg.max_depth)
            finished = alive & ~cont
            done = done + finished.astype(done.dtype)
            o_new, d_new, tm_new = gen_rays(k_regen, pixb)
            start = finished  # regenerate unconditionally until quota met
            rg = start[None]
            o = jnp.where(rg, o_new, jnp.where(cont[None], vx.o, o))
            d = jnp.where(rg, d_new, jnp.where(cont[None], vx.d, d))
            tm = jnp.where(start, tm_new, jnp.where(cont, vx.tm, tm))
            th = jnp.where(rg, 1.0, jnp.where(cont[None], vx.throughput, th))
            dp = jnp.where(start, 0, dp)
            return (it + 1, o, d, tm, th, rad, done, dp, pixb)

        sb = (
            it_a,
            take(o),
            take(d),
            take(tm),
            take(throughput),
            take(radiance),
            take(done_q),
            take(depth),
            take(pix),
        )
        sb = jax.lax.while_loop(cond_b, body_b, sb)
        # cascade: compact the lanes still owing quota into N/16 and run
        # the same quota schedule there until every quota completes
        working1 = sb[6] < spp_seq
        perm2 = jnp.argsort(~working1, stable=True)[:n3]

        def take2(x):
            return jnp.take(x, perm2, axis=-1)

        def cond_b2(s):
            return (s[0] < max_iter) & jnp.any(s[6] < spp_seq)

        sb2 = (
            sb[0],
            take2(sb[1]),
            take2(sb[2]),
            take2(sb[3]),
            take2(sb[4]),
            take2(sb[5]),
            take2(sb[6]),
            take2(sb[7]),
            take2(sb[8]),
        )
        sb2 = jax.lax.while_loop(cond_b2, body_b, sb2)
        rad1 = sb[5].at[:, perm2].set(sb2[5])
        # compacted lanes' radiance continued in the narrow arrays; the
        # scatter-set (unique indices) puts their finals back in place
        radiance = radiance.at[:, perm].set(rad1)
    if sched:
        store, sample_rad, pix_map = radiance
        vals = store.reshape(3, -1)
        pids = pix_map.reshape(-1)
        if narrow:
            # drain the survivors in an N/4 wavefront: no pool is left, so
            # each live lane just finishes its ONE in-flight sample — a
            # plain masked bounce loop, no slot/pool bookkeeping
            it_a, o, d, tm, throughput = state[0], *state[1:5]
            working, depth = state[6][0], state[7]
            perm = jnp.argsort(~working, stable=True)[:n2]

            def take(x):
                return jnp.take(x, perm, axis=-1)

            alive2 = jnp.take(working, perm)
            pix_b = jnp.where(alive2, jnp.take(pix, perm), n_pix)

            n3 = n // 16

            def cond_b(s):
                # hand off to the N/16 stage once the survivors fit there
                return (s[0] < cfg.max_depth + 1) & (jnp.sum(s[6]) > n3)

            def body_b(s):
                j, o, d, tm, th, sr, alive, dp = s
                # continue phase A's per-iteration key counter (no reuse)
                k_vertex, _ = jax.random.split(jax.random.fold_in(key, it_a + j + 1))
                vx = _eval_vertex(
                    scene, cfg, o, d, tm, th, alive, k_vertex,
                    use_pallas=True, recompute_t=False,  # forward-only drain
                )
                sr = sr + vx.radiance_add  # masked by `alive`
                dp = dp + 1
                cont = vx.cont & (dp < cfg.max_depth)
                o = jnp.where(cont[None], vx.o, o)
                d = jnp.where(cont[None], vx.d, d)
                tm = jnp.where(cont, vx.tm, tm)
                th = jnp.where(cont[None], vx.throughput, th)
                return (j + 1, o, d, tm, th, sr, cont, dp)

            sb = (
                jnp.int32(0),
                take(o),
                take(d),
                take(tm),
                take(throughput),
                take(sample_rad),
                alive2,
                take(depth),
            )
            sb = jax.lax.while_loop(cond_b, body_b, sb)
            # drain cascade (mirrors trace_regen_diff's): occupancy keeps
            # decaying through the tail, so once the survivors fit in N/16
            # compact again and finish there — same masked bounce body,
            # iteration counter carried forward so the RNG key sequence
            # continues without reuse
            alive1 = sb[6]
            perm2 = jnp.argsort(~alive1, stable=True)[:n3]

            def take2(x):
                return jnp.take(x, perm2, axis=-1)

            def cond_c(s):
                return (s[0] < cfg.max_depth + 1) & jnp.any(s[6])

            s2 = (
                sb[0],
                take2(sb[1]),
                take2(sb[2]),
                take2(sb[3]),
                take2(sb[4]),
                take2(sb[5]),
                jnp.take(alive1, perm2),
                take2(sb[7]),
            )
            s2 = jax.lax.while_loop(cond_c, body_b, s2)
            sr1 = sb[5].at[:, perm2].set(s2[5])
            vals = jnp.concatenate([vals, sr1], axis=1)
            pids = jnp.concatenate([pids, pix_b])
        # ONE regroup by pixel at launch end (sentinel n_pix rows drop off)
        img = jax.ops.segment_sum(
            vals.T,
            pids,
            num_segments=n_pix + 1,
            indices_are_sorted=False,
        )[:n_pix].T  # (3, n_pix)
        # keep the per-lane return contract: lane l carries pixel l % n_pix
        radiance = jnp.concatenate([img] * spp_par, axis=1) / float(spp_par)
    if do_sort:
        # restore pixel grouping (lanes of one pixel become adjacent again)
        r0, r1, r2 = sort_by_key(pix, (radiance[0], radiance[1], radiance[2]))
        radiance = jnp.stack([r0, r1, r2])
        if spp_par is not None:
            # the regroup sort leaves lanes pixel-CONTIGUOUS; the caller's
            # lane layout is pixel-STRIDED (lane l -> pixel l % n_pix)
            radiance = (
                radiance.reshape(3, -1, spp_par).transpose(0, 2, 1).reshape(3, n)
            )
    if return_iters:
        return radiance, state[0]
    return radiance


def measure_regen_handoff(
    scene: SceneData,
    gen_rays,
    pix0: jnp.ndarray,
    spp_seq: int,
    key,
    cfg: TraceConfig,
    spp_par: int,
    frac: int = 4,
) -> jnp.ndarray:
    """Forward-run the PER-PIXEL-pooled regeneration schedule (exactly what
    :func:`trace_regen_diff` replays) and return the iteration at which at
    most ``n/frac`` lanes are still alive — the narrow-drain handoff point.
    :func:`renderer.regen_iters_estimate` measures the GLOBAL-pool
    while_loop instead, which drains faster than the pixel-bound
    reservation the differentiable scan uses (measured on cornell (2,32):
    global pool 80 iters vs pixel pool ~88 to N/4), so the drain budget
    needs this schedule-faithful measurement.

    A lane idles only when its own pixel's pool is empty, so alive <=
    n/frac implies all but the hardest pixels' pools have drained; the
    trickle still unserved at handoff (measured 0.3% of samples on
    cornell) is simply never started, and the ``done``-normalized
    estimator absorbs it — waiting for a FULLY empty pool would cost
    ~15 more full-width iterations for that 0.3%."""
    n = pix0.shape[0]
    n2 = max(n // frac, 1)
    o0, d0, tm0 = gen_rays(jax.random.fold_in(key, 0), pix0)
    work0 = (
        jnp.ones((n,), dtype=bool),
        jnp.full((n // spp_par,), spp_par * (spp_seq - 1), dtype=jnp.int32),
    )
    max_iter = (spp_seq + 1) * cfg.max_depth + 2

    def cond(state):
        it, _, _, _, depth, work = state
        alive, _ = work
        return (it < max_iter) & (jnp.sum(alive) > n2)

    def body(state):
        it, o, d, tm, depth, work = state
        alive, remaining = work
        k_vertex, k_regen = jax.random.split(jax.random.fold_in(key, it + 1))
        vx = _eval_vertex(
            scene, cfg, o, d, tm, jnp.ones((3, n)), alive, k_vertex,
            use_pallas=True, recompute_t=False,
        )
        depth = depth + 1
        cont = vx.cont & (depth < cfg.max_depth)
        start, remaining = _pool_reserve(
            (alive & ~cont) | ~alive, remaining, spp_par
        )
        o_new, d_new, tm_new = gen_rays(k_regen, pix0)
        regen = start[None]
        o = jnp.where(regen, o_new, jnp.where(cont[None], vx.o, o))
        d = jnp.where(regen, d_new, jnp.where(cont[None], vx.d, d))
        tm = jnp.where(start, tm_new, jnp.where(cont, vx.tm, tm))
        depth = jnp.where(start, 0, depth)
        return (it + 1, o, d, tm, depth, (cont | start, remaining))

    state = (
        jnp.int32(0), o0, d0, tm0, jnp.zeros((n,), dtype=jnp.int32), work0,
    )
    return jax.lax.while_loop(cond, body, state)[0]


def trace_regen_diff(
    scene: SceneData,
    gen_rays,  # (sample_key, pix i32[N]) -> (o (3,N), d (3,N), tm (N,))
    pix0: jnp.ndarray,  # i32[N] lane -> pixel assignment (fixed; no sorting)
    spp_seq: int,  # samples each lane must complete
    n_iters: int,  # STATIC iteration count (see below)
    key,
    cfg: TraceConfig,
    use_pallas: bool = True,
    spp_par: Optional[int] = None,  # lanes per pixel (enables pooled sched)
    drain_iters: int = 0,  # narrow (N/4) drain scan after the pooled phase
):
    """Differentiable path regeneration -> ``(radiance (3, N), done i32[N])``.

    ``use_pallas``: BVH scenes route traversal through the packet kernels
    even under reverse-mode — the kernel runs under stop_gradient to pick
    the winner and closest_hit recomputes the winner's hit distance
    differentiably from its leaf row (material/texture/camera gradients
    are exact; geometry-table gradients need ``use_pallas=False``).

    The round-3 fwd+bwd bottleneck was not the VJP (a normal ~3.5x bwd/fwd)
    but the :func:`trace` forward itself: every one of ``max_depth`` scan
    steps runs the FULL wavefront although after a few bounces almost every
    lane is dead (mean path length on Cornell is ~2.5 of 50).  This
    integrator runs the SAME regeneration schedule as :func:`trace_regen` —
    a terminated lane immediately starts its pixel's next sample, so every
    iteration is ~fully occupied — but over a **fixed-length** ``lax.scan``
    instead of a ``lax.while_loop``, which makes the whole loop
    reverse-differentiable (``jax.checkpoint`` per iteration keeps backward
    memory at one-bounce residuals plus the scan carries).

    Sample accounting differs from :func:`trace_regen` in one way needed
    for a fixed trip count: per-lane radiance of the sample **in flight**
    accumulates separately (``sample_rad``) and is folded into ``radiance``
    only when the sample terminates, and ``done`` counts terminated
    samples.  A lane mid-path at iteration ``n_iters`` contributes nothing
    for that final partial sample; normalizing by ``done`` keeps the
    estimator consistent.  With ``n_iters >= spp_seq * cfg.max_depth`` every
    sample provably completes and the estimator is EXACTLY the
    :func:`trace` / :func:`trace_regen` estimator; smaller ``n_iters``
    trades a tiny truncation tail (choose via :func:`regen_iters_estimate`)
    for proportional fwd+bwd throughput.

    Discrete decisions (hit winner, branch choice, light pick, termination,
    and the regeneration schedule itself) are piecewise-constant in the
    parameters, so reverse-mode yields the same reparameterized path-replay
    gradients as :func:`trace` (reference semantics: main.rs:233-278).

    **Narrow drain** (``drain_iters > 0``, pooled mode): once the pool
    drains, no lane regenerates, so occupancy decays toward the last
    surviving paths while every scan step still pays full width — the r4
    trip-count budget added a whole ``max_depth`` of such full-width
    iterations.  Instead, ``n_iters`` should budget only the pooled phase
    (see :func:`renderer.regen_iters_estimate` with ``split_drain=True``);
    the survivors are then compacted into an N/4 wavefront (a differentiable
    ``take`` at stop-gradient indices) and finished by a second
    ``drain_iters``-step scan whose contributions scatter-add back to their
    original lanes (unique indices; the VJP is a plain gather).  Survivors
    beyond the N/4 width — or still alive after the drain — contribute
    nothing and are excluded from ``done``, exactly like truncation at
    ``n_iters`` in the single-phase form: the ``done``-normalized estimator
    stays consistent.
    """
    o0, d0, tm0 = gen_rays(jax.random.fold_in(key, 0), pix0)
    n = tm0.shape[0]
    zeros3 = jnp.zeros((3, n))
    pooled = spp_par is not None

    def body(carry, it):
        o, d, tm, throughput, sample_rad, radiance, done, depth, work = carry
        if pooled:
            alive, remaining = work
            working = alive
        else:
            working = done < spp_seq
        step_key = jax.random.fold_in(key, it + 1)
        k_vertex, k_regen = jax.random.split(step_key)

        vx = _eval_vertex(
            scene, cfg, o, d, tm, throughput, working, k_vertex, use_pallas=use_pallas
        )
        sample_rad = sample_rad + vx.radiance_add  # masked by `working`

        depth = depth + 1
        cont = vx.cont & (depth < cfg.max_depth)  # depth cap = black tail
        finished = working & ~cont  # this sample just completed
        radiance = radiance + jnp.where(finished[None], sample_rad, 0.0)
        sample_rad = jnp.where(finished[None], 0.0, sample_rad)
        done = done + finished.astype(done.dtype)

        if pooled:
            start, remaining = _pool_reserve(finished | ~alive, remaining, spp_par)
            work = (cont | start, remaining)
        else:
            start = finished  # quota mode: lanes regenerate unconditionally

        # (re)generate lanes granted a new sample
        o_new, d_new, tm_new = gen_rays(k_regen, pix0)
        regen = start[None]
        o = jnp.where(regen, o_new, jnp.where(cont[None], vx.o, o))
        d = jnp.where(regen, d_new, jnp.where(cont[None], vx.d, d))
        tm = jnp.where(start, tm_new, jnp.where(cont, vx.tm, tm))
        throughput = jnp.where(
            regen, 1.0, jnp.where(cont[None], vx.throughput, throughput)
        )
        depth = jnp.where(start, 0, depth)
        return (o, d, tm, throughput, sample_rad, radiance, done, depth, work), None

    if pooled:
        work0 = (
            jnp.ones((n,), dtype=bool),
            jnp.full((n // spp_par,), spp_par * (spp_seq - 1), dtype=jnp.int32),
        )
    else:
        work0 = jnp.zeros((0,), dtype=jnp.int32)  # unused placeholder
    carry = (
        o0,
        d0,
        tm0,
        jnp.ones((3, n)),
        zeros3,
        zeros3,
        jnp.zeros((n,), dtype=jnp.int32),
        jnp.zeros((n,), dtype=jnp.int32),
        work0,
    )
    carry, _ = jax.lax.scan(
        jax.checkpoint(body), carry, jnp.arange(n_iters, dtype=jnp.int32)
    )
    radiance, done = carry[5], carry[6]

    if pooled and drain_iters > 0:
        o, d, tm, throughput, sample_rad = carry[0], carry[1], carry[2], carry[3], carry[4]
        depth, alive = carry[7], carry[8][0]
        # Cascade: occupancy keeps decaying through the drain (measured on
        # cornell (2,32): N/4 alive at handoff -> ~1% within 8 iterations),
        # so after a short N/4 stage the remaining iterations run at N/16.
        if n >= 16 * 1024:
            stages = [(n // 4, min(8, drain_iters)), (n // 16, max(drain_iters - 8, 0))]
        else:
            stages = [(max(n // 4, 1), drain_iters)]
        gperm = jnp.arange(n, dtype=jnp.int32)  # compacted -> original lane
        cur = (o, d, tm, throughput, sample_rad, alive, depth)
        it_off = n_iters
        for n2, iters in stages:
            if iters == 0:
                continue
            o, d, tm, throughput, sample_rad, alive, depth = cur
            # compaction indices are discrete (stop-gradient by
            # construction: argsort of a bool mask); the VALUES ride a
            # differentiable take, and contributions scatter-add back to
            # the ORIGINAL lanes (unique indices; VJP = gather)
            perm = jnp.argsort(~alive, stable=True)[:n2]
            gperm = jnp.take(gperm, perm)

            def take(x):
                return jnp.take(x, perm, axis=-1)

            alive2 = take(alive)
            base = it_off  # python int captured per stage

            def drain_body(c, it2, _base=base):
                o, d, tm, th, sr, alive, dp = c
                # continue the pooled phase's per-iteration key counter
                k_vertex, _ = jax.random.split(
                    jax.random.fold_in(key, _base + it2 + 1)
                )
                vx = _eval_vertex(
                    scene, cfg, o, d, tm, th, alive, k_vertex, use_pallas=use_pallas
                )
                sr = sr + vx.radiance_add  # masked by `alive`
                dp = dp + 1
                cont = vx.cont & (dp < cfg.max_depth)  # cont implies alive
                o = jnp.where(cont[None], vx.o, o)
                d = jnp.where(cont[None], vx.d, d)
                tm = jnp.where(cont, vx.tm, tm)
                th = jnp.where(cont[None], vx.throughput, th)
                return (o, d, tm, th, sr, cont, dp), None

            c0 = (
                take(o),
                take(d),
                take(tm),
                take(throughput),
                take(sample_rad),
                alive2,
                take(depth),
            )
            cF, _ = jax.lax.scan(
                jax.checkpoint(drain_body), c0, jnp.arange(iters, dtype=jnp.int32)
            )
            sr_end, alive_end = cF[4], cF[5]
            fin = alive2 & ~alive_end  # sample completed inside this stage
            radiance = radiance.at[:, gperm].add(jnp.where(fin[None], sr_end, 0.0))
            done = done.at[gperm].add(fin.astype(done.dtype))
            cur = cF
            it_off += iters
    return radiance, done
