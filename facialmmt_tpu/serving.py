"""Fixed-latency batched serving path (BASELINE.json config 5: streaming
video -> emotion demo).

The reference has no serving story; its eval loop re-tokenizes and re-encodes
per utterance with host round-trips (SURVEY.md §3.1).  This module compiles ONE
fixed-shape inference executable up front (donated input buffers, bf16) and
exposes a predict() that always runs that executable — constant latency
regardless of request content, the TPU-native pattern for online serving.

Variable-size requests are padded into the static shapes on host:
  * up to `max_batch` utterances per call;
  * up to `face_capacity` face crops, packed contiguously;
  * missing modalities zero-masked.

Serving scales past one chip the same way training does: pass a
`parallel.mesh.MeshPlan` and the SAME fixed-shape executable runs SPMD over
the dp x tp mesh — params placed by the tensor-parallel rules, every pack
data-sharded on its leading axis, XLA inserting the collectives.  Routing,
packing, and the bucket front-end are unchanged: a mesh is a property of one
executable, not of the serving topology.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.data.image_pipeline import meld_face_eval_transform
from facialmmt_tpu.models.pipeline import FacialMMTPipeline


class EmotionServer:
    def __init__(self, cfg: FacialMMTConfig, variables: Dict[str, Any],
                 max_batch: int = 8, face_capacity: int = 64,
                 dtype=jnp.bfloat16, transfer_dtype=np.float16,
                 mesh_plan=None):
        """`transfer_dtype` is the HOST-side wire format for the padded
        audio/vision feature buffers.  Serving packs are transfer-bound, not
        compute-bound (BASELINE.md load table: a (32, 256) pack ships ~37 MB,
        of which audio fp32 alone is 15.4 MB), so the default ships features
        as fp16 — halving their bytes — and upcasts on device before the
        model's own bf16 cast.  Pass np.float32 for byte-exact transfers.

        `mesh_plan` (parallel.mesh.MeshPlan, optional): run the inference
        executable SPMD over the plan's dp x tp mesh — params placed by the
        tensor-parallel rules (text tower / fusion towers / crossmodal
        kernels shard over 'model', the rest replicates), packs data-sharded
        on their leading axes.  max_batch and face_capacity must divide dp so
        every device holds equal slices of the static shapes."""
        self.cfg = cfg
        self.max_batch = max_batch
        self.face_capacity = face_capacity
        self.dtype = dtype
        self.transfer_dtype = transfer_dtype
        self.model = FacialMMTPipeline(cfg, dtype=dtype)
        self.mesh_plan = mesh_plan
        if mesh_plan is not None:
            from facialmmt_tpu.parallel.mesh import param_shardings, replicate

            dp = mesh_plan.mesh.shape[mesh_plan.data_axis]
            assert max_batch % dp == 0 and face_capacity % dp == 0, (
                f"max_batch ({max_batch}) and face_capacity "
                f"({face_capacity}) must divide dp ({dp})")
            rep = replicate(mesh_plan)
            shardings = {
                k: (param_shardings(mesh_plan, v) if k == "params"
                    else jax.tree.map(lambda _: rep, v))
                for k, v in variables.items()}
            variables = jax.device_put(variables, shardings)
        else:
            # commit params to device ONCE: checkpoint-restored variables
            # arrive as host numpy trees, and numpy args to a jitted call are
            # re-transferred EVERY call — the full roberta-large + swin
            # parameter set per request would dwarf the pack transfer this
            # module's wire format optimizes
            variables = jax.device_put(variables)
        self.variables = variables
        from facialmmt_tpu.config import resolve_prng_impl

        # rbg on TPU: the eval gumbel draw is sampled (reference quirk) and
        # the hardware PRNG cuts its per-request threefry cost
        self._rng = jax.random.key(cfg.runtime.seed,
                                   impl=resolve_prng_impl(cfg))

        raw = cfg.data
        size = raw.swin_img_size

        def infer(variables, batch, faces_raw, key):
            faces = meld_face_eval_transform(
                faces_raw.astype(jnp.float32), img_size=size)
            full = dict(batch)
            # features ride the wire in transfer_dtype; restore fp32 here so
            # the model sees the same input dtype as the offline pipeline
            full["audio_inputs"] = batch["audio_inputs"].astype(jnp.float32)
            full["vision_feats"] = batch["vision_feats"].astype(jnp.float32)
            full["faces"] = faces.astype(dtype)
            logits = self.model.apply(variables, full, rngs={"gumbel": key})
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._infer = jax.jit(infer)
        self._template = self._zero_batch()
        # warm the executable so first real request is steady-state
        _ = self.predict_raw(self._template,
                             np.zeros((face_capacity, 160, 160, 3), np.uint8))

    def _zero_batch(self) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        d = cfg.data
        b = self.max_batch
        return {
            "dia_input_ids": np.full((b, d.max_seq_length), 1, np.int32),
            "dia_input_mask": np.zeros((b, d.max_seq_length), np.int32),
            "dia_sep_mask": np.zeros((b, d.max_seq_length), np.int32),
            "dia_idx": np.zeros(b, np.int32),
            "utt_in_dia_idx": np.zeros(b, np.int32),
            "audio_inputs": np.zeros((b, d.audio_utt_max_len,
                                      d.audio_feat_dim), self.transfer_dtype),
            "audio_mask": np.zeros((b, d.audio_utt_max_len), np.int32),
            "vision_feats": np.zeros((b, d.vision_utt_max_len,
                                      d.vision_feat_dim), self.transfer_dtype),
            "n_faces": np.zeros(b, np.int32),
            "face_utt_id": np.full(self.face_capacity, -1, np.int32),
            "face_pos": np.zeros(self.face_capacity, np.int32),
        }

    def predict_device(self, batch: Dict[str, np.ndarray],
                       faces_raw: np.ndarray):
        """Dispatch one fixed-shape inference WITHOUT reading the result
        back: returns the device array of (max_batch, num_labels) probability
        rows.  JAX dispatch is asynchronous, so a caller can enqueue the next
        pack's transfer+compute before blocking on this one — the
        AsyncBatchServer pipeline depends on this split."""
        self._rng, key = jax.random.split(self._rng)
        if self.mesh_plan is not None:
            from facialmmt_tpu.parallel.mesh import (batch_sharding,
                                                     replicate, shard_batch)

            device_batch = shard_batch(self.mesh_plan, batch)
            faces = jax.device_put(np.asarray(faces_raw),
                                   batch_sharding(self.mesh_plan))
            key = jax.device_put(key, replicate(self.mesh_plan))
            return self._infer(self.variables, device_batch, faces, key)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._infer(self.variables, device_batch,
                           jnp.asarray(faces_raw), key)

    def predict_raw(self, batch: Dict[str, np.ndarray],
                    faces_raw: np.ndarray) -> np.ndarray:
        """One fixed-shape inference call.  Returns (max_batch, num_labels)
        emotion probability rows."""
        return np.asarray(self.predict_device(batch, faces_raw))

    def predict(self, requests) -> list:
        """requests: list (<= max_batch) of dicts with optional keys
        {'audio' (La, da), 'vision' (Lv, dv), 'faces' (n, 160, 160, 3),
         'input_ids', 'input_mask', 'sep_mask', 'utt_in_dia_idx'}.
        Returns one probability vector per request."""
        batch, faces_raw = self.build_pack(requests)
        probs = self.predict_raw(batch, faces_raw)
        return [probs[j] for j in range(len(requests))]

    def build_pack(self, requests):
        """Pad a list of <= max_batch requests into the server's static
        shapes; returns (batch dict, faces_raw) ready for predict_raw /
        predict_device."""
        assert len(requests) <= self.max_batch
        batch = self._zero_batch()
        faces_raw = np.zeros((self.face_capacity, 160, 160, 3), np.uint8)
        cursor = 0
        for j, req in enumerate(requests):
            if "input_ids" in req:
                # clamp like audio/vision below: one over-length request must
                # degrade (truncate) rather than raise — in a shared pack the
                # broadcast ValueError would fail every co-batched future
                max_len = batch["dia_input_ids"].shape[1]
                ids = np.asarray(req["input_ids"])[:max_len]
                batch["dia_input_ids"][j, :len(ids)] = ids
                batch["dia_input_mask"][j, :len(ids)] = 1
                sep = np.asarray(req.get("sep_mask", []))[:max_len]
                batch["dia_sep_mask"][j, :len(sep)] = sep
                batch["utt_in_dia_idx"][j] = req.get("utt_in_dia_idx", 0)
            batch["dia_idx"][j] = j
            if "audio" in req:
                a = np.asarray(req["audio"])
                la = min(a.shape[0], batch["audio_inputs"].shape[1])
                batch["audio_inputs"][j, :la] = a[:la]  # casts to wire dtype
                batch["audio_mask"][j, :la] = 1
            if "vision" in req:
                v = np.asarray(req["vision"])
                lv = min(v.shape[0], batch["vision_feats"].shape[1])
                batch["vision_feats"][j, :lv] = v[:lv]
            faces = req.get("faces")
            if faces is not None:
                # exceeding the server's packed buffer is an ERROR, not a
                # silent drop
                take = self.face_take(faces)
                if cursor + take > self.face_capacity:
                    from facialmmt_tpu.data.meld import FaceCapacityError

                    raise FaceCapacityError(cursor + take, self.face_capacity,
                                            "serving")
                faces_raw[cursor:cursor + take] = np.asarray(
                    faces[:take], np.uint8)  # one vectorized copy, not a
                batch["face_utt_id"][cursor:cursor + take] = j  # per-face loop
                batch["face_pos"][cursor:cursor + take] = np.arange(
                    take, dtype=np.int32)
                cursor += take
                batch["n_faces"][j] = take
        return batch, faces_raw

    def face_take(self, faces) -> int:
        """How many of a request's face crops enter the pack.  The
        per-utterance cap mirrors the reference's face-list truncation
        (reference utils/dataset.py:278-279).  Single source of truth for
        both build_pack's copy and AsyncBatchServer's capacity accounting —
        the two must agree or the packer would assemble packs build_pack
        rejects."""
        return min(len(faces), self.cfg.data.vision_utt_max_len)

    def benchmark_latency(self, iters: int = 20) -> Dict[str, float]:
        batch = self._zero_batch()
        faces = np.zeros((self.face_capacity, 160, 160, 3), np.uint8)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self.predict_raw(batch, faces)
            times.append(time.perf_counter() - t0)
        arr = np.asarray(times) * 1000
        return {"p50_ms": float(np.percentile(arr, 50)),
                "p99_ms": float(np.percentile(arr, 99)),
                "mean_ms": float(arr.mean())}


class AsyncBatchServer:
    """Concurrent front-end for EmotionServer: a request queue + packer thread.

    The static (max_batch, face_capacity) buckets exist for concurrent load —
    a single request pays for the whole padded executable (see the module
    docstring), but under load the packer fills the slots: requests queue up,
    and the packer drains up to max_batch of them (respecting the packed-face
    capacity) into ONE fixed-shape inference, waiting at most
    `batch_deadline_ms` from the first pending request before dispatching a
    partial pack.  No reference equivalent — serving is this framework's own
    capability (SURVEY.md §2 has no serving row).

    `server` may also be a SEQUENCE of EmotionServers sharing one set of
    variables (a bucket ROUTER): each drained pack then dispatches on the
    smallest bucket it fits, so a single front-end serves light load at the
    small bucket's latency and saturated load at the big bucket's
    throughput — the static-shape answer to "autoscaling" (each bucket is
    one pre-compiled executable; routing is a host-side pick, never a
    recompile).  Packs grow past a bucket boundary only when the waiting
    backlog can fill the larger executable (see the escalation rule in
    `_run`) — mid-range load therefore rides the mid bucket's latency
    instead of stalling behind under-filled big-bucket steps.
    `bucket_choices` records the (max_batch, face_capacity) chosen per pack.

    submit() returns a concurrent.futures.Future resolving to the request's
    probability vector; callers block on .result().  One packer thread owns
    the TPU executables, so device calls are naturally serialized.
    """

    def __init__(self, server, batch_deadline_ms: float = 5.0,
                 pipeline_depth: int = 2, boundary_policy: str = "backlog"):
        import collections
        import queue as queue_mod
        import threading

        servers = (list(server) if isinstance(server, (list, tuple))
                   else [server])
        # smallest-first: the router picks the FIRST bucket that fits a pack
        self.servers = sorted(
            servers, key=lambda s: (s.max_batch, s.face_capacity))
        # the largest bucket bounds the packer's drain loop
        self.server = self.servers[-1]
        self.deadline = batch_deadline_ms / 1000.0
        # packs in flight on the device before the packer blocks on a
        # readback: JAX dispatch is async, so with depth 2 the NEXT pack's
        # host padding + host->device transfer overlaps the CURRENT pack's
        # device compute (measured: lifts the saturated (32,256) bucket
        # ~1.5x over the serial packer — BASELINE.md load table)
        self.pipeline_depth = max(1, pipeline_depth)
        # 'backlog': grow a pack past a bucket boundary only when the waiting
        # backlog can fill the larger executable (see _run); 'greedy': always
        # fill toward the largest bucket (the pre-round-4b behavior, kept for
        # A/B measurement — experiments/serving_load.py routerab)
        assert boundary_policy in ("backlog", "greedy")
        self.boundary_policy = boundary_policy
        self._q: "queue_mod.Queue" = queue_mod.Queue()
        self._holdover = collections.deque()  # didn't fit the last pack
        self._stop = threading.Event()
        self.pack_sizes: list = []  # batch-fill telemetry
        self.bucket_choices: list = []  # (max_batch, face_capacity) per pack
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, request: Dict[str, Any]):
        from concurrent.futures import Future

        fut: Future = Future()
        if self._stop.is_set():
            fut.set_exception(RuntimeError("AsyncBatchServer is closed"))
            return fut
        self._q.put((request, fut))
        # close() may have drained between the check above and the put: the
        # post-join sweep in close() catches that window, but a submit racing
        # ahead of it must not return a future nobody will resolve
        if self._stop.is_set():
            self._fail_queued()
        return fut

    def _fail_queued(self):
        import queue as queue_mod

        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue_mod.Empty:
                return
            if not fut.done():
                fut.set_exception(RuntimeError("AsyncBatchServer is closed"))

    def close(self):
        """Stop the packer.  In-flight packs resolve normally; requests still
        queued (or submitted after close) fail with RuntimeError rather than
        stranding their futures until the caller's timeout."""
        self._stop.set()
        self._thread.join(timeout=5.0)
        # sweep enqueues that raced past the packer's final drain
        self._fail_queued()

    def _faces_of(self, request) -> int:
        faces = request.get("faces")
        if faces is None:
            return 0
        return self.server.face_take(faces)

    def _bucket_for(self, n: int, faces: int):
        """Smallest bucket fitting a pack of `n` requests / `faces` face
        slots; None when even the largest doesn't fit."""
        return next((s for s in self.servers
                     if n <= s.max_batch and faces <= s.face_capacity), None)

    def _next_item(self, timeout):
        import queue as queue_mod

        if self._holdover:
            return self._holdover.popleft()
        try:
            return self._q.get(timeout=timeout)
        except queue_mod.Empty:
            return None

    def _resolve(self, pack, device_probs):
        try:
            probs = np.asarray(device_probs)  # blocks until compute done
        except Exception as e:
            for _, fut in pack:
                fut.set_exception(e)
            return
        for j, (_, fut) in enumerate(pack):
            fut.set_result(probs[j])

    def _run(self):
        import collections

        inflight = collections.deque()  # (pack, device_probs)
        while not self._stop.is_set():
            first = self._next_item(timeout=0.05)
            if first is None:
                while inflight:  # idle: drain the pipeline
                    self._resolve(*inflight.popleft())
                continue
            pack, faces = [first], self._faces_of(first[0])
            t0 = time.perf_counter()
            while len(pack) < self.server.max_batch:
                left = self.deadline - (time.perf_counter() - t0)
                if left <= 0:
                    break
                item = self._next_item(timeout=left)
                if item is None:
                    break
                need = self._faces_of(item[0])
                if faces + need > self.server.face_capacity:
                    self._holdover.append(item)  # leads the next pack
                    break
                b_cur = self._bucket_for(len(pack), faces)
                b_new = self._bucket_for(len(pack) + 1, faces + need)
                if (self.boundary_policy == "backlog"
                        and b_cur is not None and b_new is not b_cur):
                    # bucket boundary: the larger executable only earns its
                    # step time dispatched (nearly) full.  Escalate only when
                    # the backlog can fill it; otherwise dispatch the
                    # smaller, FASTER executable now and let this item lead
                    # the next pack.  Without this, one transient backlog
                    # spike at mid-range load flips the router into the
                    # big-bucket regime and keeps it there (head-of-line:
                    # shallow queues kept stalling behind ~1.2 s big-bucket
                    # steps — BASELINE.md router table, rate 20).
                    # KNOWN LIMIT: fill is justified in request SLOTS only.
                    # For bucket sets differentiated mainly by face_capacity
                    # (e.g. (8,64)+(8,256)) a small backlog can escalate to
                    # an executable whose face buffer stays mostly empty.
                    # The measured default set (1,12)/(8,64)/(32,256) scales
                    # both dims together, where the slot rule A/B-won
                    # (BASELINE.md round-4c/5); re-measure before deploying a
                    # face-skewed bucket set.
                    backlog = self._q.qsize() + len(self._holdover)
                    if backlog < b_new.max_batch - len(pack) - 1:
                        self._holdover.append(item)
                        break
                pack.append(item)
                faces += need
            self.pack_sizes.append(len(pack))
            chosen = self._bucket_for(len(pack), faces)
            if chosen is None:
                # only reachable when a SINGLE request's face count exceeds
                # every bucket's packed-face buffer (the drain loop already
                # bounds multi-request packs to the largest bucket): fail that
                # request the way the serial path does and keep serving —
                # a raise here would kill the packer thread and strand every
                # later caller
                from facialmmt_tpu.data.meld import FaceCapacityError

                for _, fut in pack:
                    fut.set_exception(FaceCapacityError(
                        faces, self.server.face_capacity, "serving"))
                continue
            self.bucket_choices.append((chosen.max_batch,
                                        chosen.face_capacity))
            try:
                batch, faces_raw = chosen.build_pack([r for r, _ in pack])
                device_probs = chosen.predict_device(batch, faces_raw)
            except Exception as e:  # surface to every waiting caller
                for _, fut in pack:
                    fut.set_exception(e)
                continue
            inflight.append((pack, device_probs))
            # keep the pipe full only under back-pressure: with no queued
            # requests, resolve immediately so light-load latency matches the
            # serial packer (the pipeline only pays off when the next pack is
            # ready to dispatch before this one finishes)
            while (len(inflight) >= self.pipeline_depth or
                   (inflight and self._q.empty() and not self._holdover)):
                self._resolve(*inflight.popleft())
        while inflight:
            self._resolve(*inflight.popleft())
        # fail, don't strand, anything still queued at close(): an unresolved
        # future makes its caller wait out the FULL result() timeout
        import queue as queue_mod

        leftovers = list(self._holdover)
        self._holdover.clear()
        while True:
            try:
                leftovers.append(self._q.get_nowait())
            except queue_mod.Empty:
                break
        for _, fut in leftovers:
            fut.set_exception(RuntimeError("AsyncBatchServer closed with "
                                           "the request still queued"))


def benchmark_load(server: EmotionServer, rate_utt_per_s: float,
                   duration_s: float = 10.0, seed: int = 0,
                   batch_deadline_ms: float = 5.0,
                   make_request=None,
                   boundary_policy: str = "backlog") -> Dict[str, float]:
    """Drive an AsyncBatchServer with Poisson arrivals at `rate_utt_per_s`
    for `duration_s`, and report achieved throughput + end-to-end request
    latency (queue wait + packing deadline + device step) + batch fill."""
    import threading

    front = AsyncBatchServer(server, batch_deadline_ms=batch_deadline_ms,
                             boundary_policy=boundary_policy)
    rng = np.random.default_rng(seed)
    if make_request is None:
        d = front.server.cfg.data
        def make_request(i):
            return {
                "input_ids": np.ones(16, np.int32),
                "audio": np.zeros((d.audio_utt_max_len, d.audio_feat_dim),
                                  np.float32),
                "vision": np.zeros((d.vision_utt_max_len, d.vision_feat_dim),
                                   np.float32),
                "faces": np.zeros((8, 160, 160, 3), np.uint8),
            }

    lat_lock = threading.Lock()
    latencies: list = []
    futures: list = []

    def on_done(t_submit):
        def cb(fut):
            if fut.exception() is None:
                with lat_lock:
                    latencies.append(time.perf_counter() - t_submit)
        return cb

    t_start = time.perf_counter()
    i = 0
    next_t = 0.0
    while True:
        now = time.perf_counter() - t_start
        if now >= duration_s:
            break
        if now < next_t:
            time.sleep(min(next_t - now, 0.01))
            continue
        t_submit = time.perf_counter()
        fut = front.submit(make_request(i))
        fut.add_done_callback(on_done(t_submit))
        futures.append(fut)
        i += 1
        next_t += rng.exponential(1.0 / rate_utt_per_s)
    for fut in futures:
        fut.result(timeout=60.0)
    wall = time.perf_counter() - t_start
    front.close()
    arr = np.asarray(latencies) * 1000
    stats = {
        "offered_rate": rate_utt_per_s,
        "achieved_utt_per_s": len(latencies) / wall,
        "p50_ms": float(np.percentile(arr, 50)),
        "p99_ms": float(np.percentile(arr, 99)),
        "mean_batch_fill": float(np.mean(front.pack_sizes)),
        "n_requests": len(latencies),
    }
    if len(front.servers) > 1:  # bucket-router telemetry
        from collections import Counter

        stats["bucket_counts"] = {
            f"{mb},{cap}": n for (mb, cap), n in sorted(
                Counter(front.bucket_choices).items())}
    return stats
