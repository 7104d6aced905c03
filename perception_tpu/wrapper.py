"""The orchestration facade: one typed entry point assembling
producers -> extractors (pose / face / hand) -> savers / GUI.

Mirrors the reference's single most load-bearing API artifact, the
OpenPose ``Wrapper`` (configure(WrapperStruct...) / exec / start / stop
and the async emplaceAndPop surface,
``openpose/include/openpose/wrapper/wrapper.hpp:73-227``; the worker
graph assembly ``wrapperAuxiliary.hpp:970-1158``; construction-time
``wrapperConfigureSanityChecks``). The TPU redesign collapses the
thread/queue worker graph into jitted per-frame extractor calls plus a
plain Python pump thread — XLA owns the intra-step parallelism, the
host loop only feeds frames and drains results.

Typical use (examples/03, 04, 10, 11 and ``cli.py pose`` are built on
this):

    from perception_tpu.wrapper import Perception, WrapperStructInput
    p = Perception(input=WrapperStructInput(source="frames_dir/"))
    for datum in p.exec():
        print(datum.frame_index, int(datum.people.mask.sum()))

or the async form::

    p.start()
    ...
    datum = p.wait_and_pop()
    p.stop()
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------------
# Typed configuration structs (WrapperStructPose/Face/Hand/Input/
# Output/Gui, flags.hpp -> wrapperStructPose.hpp layering).
# --------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WrapperStructPose:
    enabled: bool = True
    topology: str = "MPI_15"
    net_hw: Tuple[int, int] = (128, 128)
    scales: Tuple[float, ...] = (1.0,)
    params: Any = None          # None -> trained fixture if present,
                                # else randomly initialized net
    top_n: int = 0              # KeepTopNPeople (0 = keep all)


@dataclasses.dataclass(frozen=True)
class WrapperStructFace:
    enabled: bool = False
    params: Any = None          # None -> trained face fixture
    max_faces: int = 4


@dataclasses.dataclass(frozen=True)
class WrapperStructHand:
    enabled: bool = False
    params: Any = None          # None -> trained hand fixture


@dataclasses.dataclass(frozen=True)
class WrapperStructInput:
    source: Any = None          # reader with .frames(), directory str,
                                # video path, or sequence of arrays
    frame_limit: Optional[int] = None
    fps_keep: Optional[float] = None  # producer pacing (producer.cpp
                                      # fps-keeping; io/producers.paced)


@dataclasses.dataclass(frozen=True)
class WrapperStructOutput:
    json_dir: Optional[str] = None     # per-frame people JSON
    video_path: Optional[str] = None   # rendered frames (requires gui
                                       # overlay or raw frames)
    udp: Optional[Tuple[str, int]] = None  # keypoint datagrams


@dataclasses.dataclass(frozen=True)
class WrapperStructGui:
    display: bool = False       # FrameDisplayer window (falls back to
                                # the headless sink off-display)
    info_overlay: bool = True   # FPS/people counter overlay


class PerceptionDatum(NamedTuple):
    """The pipeline's unit of work (core/datum.hpp:41-160 analog)."""
    frame_index: int
    timestamp: float
    image: np.ndarray
    people: Any                 # ops.paf.People (keypoints/score/mask)
    faces: Any                  # dict of face outputs or None
    hands: Any                  # dict of hand outputs or None


class Perception:
    """Facade: configure once, then ``exec()`` / ``start()``+``pop`` /
    ``emplace_and_pop()``."""

    def __init__(
        self,
        pose: WrapperStructPose = WrapperStructPose(),
        face: WrapperStructFace = WrapperStructFace(),
        hand: WrapperStructHand = WrapperStructHand(),
        input: Optional[WrapperStructInput] = None,
        output: Optional[WrapperStructOutput] = None,
        gui: Optional[WrapperStructGui] = None,
    ):
        self.pose_cfg = pose
        self.face_cfg = face
        self.hand_cfg = hand
        self.input_cfg = input or WrapperStructInput()
        self.output_cfg = output or WrapperStructOutput()
        self.gui_cfg = gui or WrapperStructGui()
        self._sanity_checks()
        self._build()
        self._thread: Optional[threading.Thread] = None
        self._out_q: "queue.Queue[Optional[PerceptionDatum]]" = queue.Queue(maxsize=8)
        self._stop = threading.Event()

    # -- sanity checks (wrapperConfigureSanityChecks) -----------------
    def _sanity_checks(self) -> None:
        p, f, h = self.pose_cfg, self.face_cfg, self.hand_cfg
        if not (p.enabled or f.enabled or h.enabled):
            raise ValueError("no extractor enabled: set pose/face/hand")
        if h.enabled and not p.enabled:
            raise ValueError(
                "hand extraction needs pose keypoints for the hand ROI "
                "(reference: HandDetector from wrist/elbow keypoints)"
            )
        if p.enabled:
            if p.net_hw[0] % 8 or p.net_hw[1] % 8:
                raise ValueError(f"pose net_hw must be multiples of 8, got {p.net_hw}")
            if not p.scales or any(s <= 0 for s in p.scales):
                raise ValueError(f"bad scale pyramid {p.scales}")
            if p.top_n < 0:
                raise ValueError("top_n must be >= 0")
        if f.enabled and f.max_faces < 1:
            raise ValueError("max_faces must be >= 1")
        o = self.output_cfg
        if o.video_path is not None and not str(o.video_path).endswith(
            (".mp4", ".avi", ".mkv")
        ):
            raise ValueError(f"unsupported video container: {o.video_path}")
        i = self.input_cfg
        if i.fps_keep is not None and i.fps_keep <= 0:
            raise ValueError("fps_keep must be positive")
        if i.frame_limit is not None and i.frame_limit < 1:
            raise ValueError("frame_limit must be >= 1")

    # -- graph assembly ----------------------------------------------
    def _build(self) -> None:
        import jax
        import jax.numpy as jnp

        self._pose_fn = None
        self._face_fn = None
        self._hand_fn = None

        if self.pose_cfg.enabled:
            from perception_tpu.models import pose_fixture as PF
            from perception_tpu.models.pose import extract_people, init_posenet
            from perception_tpu.utils.keypoints import keep_top_n_people

            cfg = self.pose_cfg
            params = cfg.params
            net = None
            topology = cfg.topology
            net_hw = cfg.net_hw
            if params is None and PF.fixture_available() and (
                topology == PF.FIXTURE_TOPOLOGY
            ):
                params = PF.load_fixture()
                net = PF.tiny_posenet()
                net_hw = PF.FIXTURE_HW
            elif params is None:
                params = init_posenet(jax.random.key(0), topology, net_hw)
            self._pose_params = params

            def pose_fn(p, image):
                ppl = extract_people(
                    p, image, topology, scales=cfg.scales, net_hw=net_hw,
                    net=net,
                )
                if cfg.top_n:
                    kp, sc, m = keep_top_n_people(
                        ppl.keypoints, ppl.score, ppl.mask, n=cfg.top_n
                    )
                    ppl = ppl._replace(keypoints=kp, score=sc, mask=m)
                return ppl

            self._pose_fn = jax.jit(pose_fn)

        if self.face_cfg.enabled:
            from perception_tpu.models import face_fixture as FF
            from perception_tpu.models.face import (
                gaze_from_landmarks,
                head_pose_pnp,
                normalize_landmarks,
            )
            from perception_tpu.models.hand import crop_image

            fparams = self.face_cfg.params
            if fparams is None:
                if not FF.fixture_available():
                    raise ValueError(
                        "face enabled but no params given and the trained "
                        "face fixture is absent (tools/train_face_fixture.py)"
                    )
                fparams = FF.load_fixture()
            self._face_params = fparams
            fhw = FF.FIXTURE_HW
            fx = FF.FIXTURE_FX
            cx, cy = fhw[1] / 2.0, fhw[0] / 2.0

            def face_fn(p, image):
                img = jax.image.resize(image, fhw + image.shape[2:], "bilinear")
                if img.ndim == 3:
                    img = jnp.mean(img, axis=-1)
                det = FF.detect_with_net(p["det"], img)
                box = det.boxes[0]
                patch = crop_image(img, box, FF.FIXTURE_CROP) / 255.0
                uv, m, _ = FF.landmarks_from_crop(p["landmark"], patch, box)
                T, px_err = head_pose_pnp(uv, m, fx, fx, cx, cy)
                gaze_r, gaze_l = gaze_from_landmarks(uv, T, fx, fx, cx, cy)
                inten, _ = FF.tiny_au_head().apply(
                    p["au"], normalize_landmarks(uv, m)
                )
                return {
                    "boxes": det.boxes, "box_mask": det.mask,
                    "landmarks": uv, "landmark_mask": m,
                    "head_pose": T, "reproj_px": px_err,
                    "gaze": jnp.stack([gaze_r, gaze_l]),
                    "au_intensities": inten,
                }

            # Eager (not jitted): the face helpers use boolean-mask
            # indexing (PnP correspondence selection) that only works
            # with concrete values.
            self._face_fn = face_fn

        if self.hand_cfg.enabled:
            from perception_tpu.models import hand_fixture as HF
            from perception_tpu.models.hand import hand_roi_from_pose

            hparams = self.hand_cfg.params
            if hparams is None:
                if not HF.fixture_available():
                    raise ValueError(
                        "hand enabled but no params given and the trained "
                        "hand fixture is absent (tools/train_hand_fixture.py)"
                    )
                hparams = HF.load_fixture()
            self._hand_params = hparams

            def hand_fn(p, image, keypoints):
                import jax.numpy as jnp

                gray = image if image.ndim == 2 else jnp.mean(image, axis=-1)
                box, ok = hand_roi_from_pose(keypoints)
                uv, m, _scores = HF.extract_hand_tiny(p, gray, box)
                return {"box": box, "box_valid": ok,
                        "landmarks": uv, "landmark_mask": m & ok}

            self._hand_fn = hand_fn  # eager, same reason as face_fn

        # Output sinks.
        self._savers = []
        o = self.output_cfg
        if o.udp is not None:
            from perception_tpu.io.savers import UdpSender

            self._udp = UdpSender(*o.udp)
        else:
            self._udp = None
        if o.video_path is not None:
            from perception_tpu.io.savers import VideoWriter

            self._video = VideoWriter(o.video_path)
        else:
            self._video = None
        if self.gui_cfg.display:
            from perception_tpu.io.gui import Gui

            self._gui = Gui()
        else:
            self._gui = None

    # -- synchronous single-frame API (emplaceAndPop) -----------------
    def emplace_and_pop(self, image, frame_index: int = 0,
                        timestamp: Optional[float] = None) -> PerceptionDatum:
        """Run every enabled extractor on one frame."""
        import jax.numpy as jnp

        img = jnp.asarray(image, jnp.float32)
        if img.ndim == 2:
            img = img[..., None] * jnp.ones((1, 1, 3), jnp.float32)
        if img.max() > 1.5:  # uint8-scaled input
            img_unit = img / 255.0
        else:
            img_unit = img
        people = faces = hands = None
        if self._pose_fn is not None:
            people = self._pose_fn(self._pose_params, img_unit)
        if self._face_fn is not None:
            faces = self._face_fn(self._face_params, img)
        if self._hand_fn is not None and people is not None:
            hands = self._hand_fn(self._hand_params, img, people.keypoints[0])
        datum = PerceptionDatum(
            frame_index=frame_index,
            timestamp=time.time() if timestamp is None else timestamp,
            image=np.asarray(image),
            people=people,
            faces=faces,
            hands=hands,
        )
        self._route_outputs(datum)
        return datum

    def _route_outputs(self, datum: PerceptionDatum) -> None:
        o = self.output_cfg
        if o.json_dir is not None and datum.people is not None:
            from pathlib import Path

            from perception_tpu.io.savers import save_people_json

            Path(o.json_dir).mkdir(parents=True, exist_ok=True)
            save_people_json(
                Path(o.json_dir) / f"people_{datum.frame_index:06d}.json",
                np.asarray(datum.people.keypoints),
                np.asarray(datum.people.mask),
            )
        if self._udp is not None and datum.people is not None:
            self._udp.send_array(np.asarray(datum.people.keypoints))
        if self._video is not None:
            frame = datum.image
            if frame.ndim == 2:
                frame = np.stack([frame] * 3, -1)
            self._video.write(frame.astype(np.uint8))
        if self._gui is not None:
            n = (int(np.asarray(datum.people.mask).sum())
                 if datum.people is not None else None)
            self._gui.update(datum.image.astype(np.uint8), num_people=n)

    # -- producer plumbing --------------------------------------------
    def _frames(self) -> Iterator[Tuple[float, np.ndarray]]:
        from perception_tpu.io import producers as prod

        src = self.input_cfg.source
        if src is None:
            raise ValueError("exec()/start() need WrapperStructInput.source")
        if hasattr(src, "frames"):
            it = src.frames()
        elif isinstance(src, (list, tuple)) or (
            isinstance(src, np.ndarray) and src.ndim == 4
        ):
            it = ((float(i), np.asarray(f)) for i, f in enumerate(src))
        else:
            s = str(src)
            if s.endswith((".mp4", ".avi", ".mkv", ".mov")):
                it = prod.VideoReader(s).frames()
            else:
                it = prod.ImageDirectoryReader(s).frames()
        if self.input_cfg.fps_keep is not None:
            it = prod.paced(it, self.input_cfg.fps_keep)
        return it

    # -- synchronous run (Wrapper::exec) ------------------------------
    def exec(self) -> Iterator[PerceptionDatum]:
        limit = self.input_cfg.frame_limit
        for i, (t, frame) in enumerate(self._frames()):
            if limit is not None and i >= limit:
                break
            yield self.emplace_and_pop(frame, frame_index=i, timestamp=t)

    # -- async run (Wrapper::start/stop + waitAndPop) -----------------
    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("already started")
        self._stop.clear()

        def pump():
            try:
                for datum in self.exec():
                    if self._stop.is_set():
                        break
                    self._out_q.put(datum)
            finally:
                self._out_q.put(None)  # end-of-stream sentinel

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def try_pop(self) -> Optional[PerceptionDatum]:
        try:
            return self._out_q.get_nowait()
        except queue.Empty:
            return None

    def wait_and_pop(self, timeout: Optional[float] = None) -> Optional[PerceptionDatum]:
        """Next datum, or None at end-of-stream."""
        return self._out_q.get(timeout=timeout)

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        if self._video is not None:
            self._video.close()
        if self._udp is not None:
            self._udp.close()
        if self._gui is not None:
            self._gui.close()
