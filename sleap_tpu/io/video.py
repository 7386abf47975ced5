"""Video reading: uniform frame access over multiple container backends.

Rebuild of ``/root/reference/sleap/io/video.py`` (``Video`` facade at
:1001, backends ``MediaVideo:340``, ``HDF5Video:47``, ``NumpyVideo:511``,
``SingleImageVideo:803``, ``DummyVideo:23``). Design: host-side decode only —
frames come back as numpy (H, W, C) uint8; the device pipeline handles
normalization on-chip.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import attr
import h5py
import numpy as np


@attr.s(auto_attribs=True, eq=False)
class DummyVideo:
    """Fake video backend for tests and placeholder references."""

    filename: str = ""
    height: int = 2000
    width: int = 2000
    frames: int = 10000
    channels: int = 1
    dummy: bool = True

    @property
    def test_frame(self):
        return self.get_frame(0)

    def get_frame(self, idx) -> np.ndarray:
        return np.zeros((self.height, self.width, self.channels), dtype="uint8")


@attr.s(auto_attribs=True, eq=False)
class MediaVideo:
    """OpenCV-decoded media files (mp4/avi/...).

    Thread-safe via a reader lock; sequential reads avoid re-seeking
    (the reference does the same, video.py:369).
    """

    filename: str = attr.ib(default=None)
    grayscale: bool = attr.ib(default=None)
    bgr: bool = attr.ib(default=True)
    dataset: str = ""
    input_format: str = ""

    EXTS = ("mp4", "avi", "mov", "mj2", "mkv")

    _reader_ = None
    _test_frame_ = None
    _lock = None

    def __attrs_post_init__(self):
        self._lock = threading.RLock()

    @property
    def __reader(self):
        if self._reader_ is None:
            if not os.path.isfile(self.filename):
                raise FileNotFoundError(
                    f"Could not find video file named {self.filename}."
                )
            import cv2

            self._reader_ = cv2.VideoCapture(self.filename)
        return self._reader_

    @property
    def test_frame(self) -> np.ndarray:
        if self._test_frame_ is None:
            self._test_frame_ = self.get_frame(0, grayscale=False)
        return self._test_frame_

    @property
    def fps(self) -> float:
        import cv2

        return self.__reader.get(cv2.CAP_PROP_FPS)

    @property
    def frames(self) -> int:
        import cv2

        return int(self.__reader.get(cv2.CAP_PROP_FRAME_COUNT))

    @property
    def is_grayscale(self) -> bool:
        if self.grayscale is None:
            frame = self.test_frame
            self.grayscale = bool(np.all(frame[..., 0] == frame[..., -1]))
        return self.grayscale

    @property
    def channels(self) -> int:
        return 1 if self.is_grayscale else self.test_frame.shape[2]

    @property
    def height(self) -> int:
        return self.test_frame.shape[0]

    @property
    def width(self) -> int:
        return self.test_frame.shape[1]

    @property
    def dtype(self):
        return self.test_frame.dtype

    def reset(
        self,
        filename: Optional[str] = None,
        grayscale: Optional[bool] = None,
        bgr: Optional[bool] = None,
    ) -> None:
        """Drop the open reader (and cached test frame) and optionally
        reconfigure the backend, like the reference's ``MediaVideo.reset``
        (reference video.py:478): ``grayscale`` omitted -> re-detect from the
        file; passing it pins the channel mode for subsequent reads.
        """
        if self._reader_ is not None:
            self._reader_.release()
        self._reader_ = None
        self._test_frame_ = None
        if filename is not None:
            self.filename = filename
        if grayscale is not None:
            self.grayscale = grayscale
        elif filename is not None:
            self.grayscale = None  # re-detect against the new file
        if bgr is not None:
            self.bgr = bgr

    def get_frame(self, idx: int, grayscale: Optional[bool] = None) -> np.ndarray:
        import cv2

        with self._lock:
            reader = self.__reader
            if reader.get(cv2.CAP_PROP_POS_FRAMES) != idx:
                reader.set(cv2.CAP_PROP_POS_FRAMES, idx)
            success, frame = reader.read()
        if not success or frame is None:
            raise KeyError(f"Unable to load frame {idx} from {self.filename}.")
        if grayscale is None:
            grayscale = self.is_grayscale
        if grayscale:
            frame = frame[..., 0][..., None]
        elif self.bgr:
            frame = frame[..., ::-1]
        return frame


@attr.s(auto_attribs=True, eq=False)
class HDF5Video:
    """Frames stored in an HDF5 dataset, raw or as encoded png/jpg strings.

    Encoded-frame datasets (used by ``.pkg.slp`` training packages; reference
    video.py:182-248) carry a ``format`` attr and an optional
    ``frame_numbers`` sibling mapping dataset rows to source frame indices.
    """

    filename: str = attr.ib(default=None)
    dataset: str = attr.ib(default=None)
    input_format: str = attr.ib(default="channels_last")
    convert_range: bool = attr.ib(default=True)
    #: When True, frames absent from the file are read from the original
    #: source video recorded at save time (reference video.py:171-180).
    enable_source_video: bool = attr.ib(default=True)

    EXTS = ("h5", "hdf5", "slp")

    _file_ = None
    _dataset_ = None
    _format_ = None
    _frame_map = None
    _source_video_dict = None

    def _open(self):
        if self._file_ is None:
            self._file_ = h5py.File(self.filename, "r")
            ds_name = self.dataset
            if ds_name is not None and ds_name in self._file_:
                obj = self._file_[ds_name]
                if isinstance(obj, h5py.Group):
                    # Group convention: actual frames under "<dataset>/video".
                    if "video" in obj:
                        ds_name = ds_name.rstrip("/") + "/video"
                        obj = self._file_[ds_name]
                self._dataset_ = obj
            else:
                raise KeyError(
                    f"Dataset {self.dataset!r} not found in {self.filename}."
                )
            self._format_ = self._dataset_.attrs.get("format", "")
            if isinstance(self._format_, bytes):
                self._format_ = self._format_.decode()
            # Frame-number remapping for embedded videos.
            parent = self._dataset_.parent
            if "frame_numbers" in parent:
                nums = parent["frame_numbers"][:]
                self._frame_map = {int(n): i for i, n in enumerate(nums)}
            if "source_video" in parent and "json" in parent["source_video"].attrs:
                raw = parent["source_video"].attrs["json"]
                if isinstance(raw, bytes):
                    raw = raw.decode()
                self._source_video_dict = json.loads(raw)
        return self._dataset_

    @property
    def embedded_frame_inds(self) -> List[int]:
        self._open()
        if self._frame_map is None:
            return list(range(self.frames))
        # Stored (dataset) order, matching the reference (video.py:188-191).
        return list(self._frame_map.keys())

    @property
    def has_embedded_images(self) -> bool:
        """True when the file carries cached per-frame images — i.e. a
        frame_numbers mapping exists, whatever the storage format
        (reference video.py:181-184)."""
        self._open()
        if self._frame_map is not None:
            return len(self._frame_map) > 0
        return bool(self._format_)

    @property
    def source_video_available(self) -> bool:
        self._open()
        return self.enable_source_video and self._source_video_dict is not None

    @property
    def source_video(self) -> Optional["Video"]:
        self._open()
        if self._source_video_dict is None:
            return None
        return Video.from_dict(self._source_video_dict)

    @property
    def test_frame(self) -> np.ndarray:
        if not self.embedded_frame_inds:
            raise ValueError(
                f"{self.filename}: no frames are embedded in this package "
                "(saving with with_images=True embeds only user-labeled "
                "frames; pass embed_all_labeled=True for predicted-only "
                "projects)."
            )
        return self.get_frame(self.embedded_frame_inds[0])

    @property
    def frames(self) -> int:
        ds = self._open()
        return ds.shape[0]

    @property
    def channels(self) -> int:
        if self.has_embedded_images:
            return self.test_frame.shape[2]
        ds = self._open()
        return ds.shape[1] if self.input_format == "channels_first" else ds.shape[3]

    @property
    def height(self) -> int:
        if self.has_embedded_images:
            return self.test_frame.shape[0]
        ds = self._open()
        return ds.shape[2] if self.input_format == "channels_first" else ds.shape[1]

    @property
    def width(self) -> int:
        if self.has_embedded_images:
            return self.test_frame.shape[1]
        ds = self._open()
        return ds.shape[3] if self.input_format == "channels_first" else ds.shape[2]

    @property
    def dtype(self):
        return self.test_frame.dtype

    @property
    def last_frame_idx(self) -> int:
        """Highest addressable frame index: the max ORIGINAL frame number
        when a frame_numbers mapping exists (reference video.py:280-295)."""
        self._open()
        if self._frame_map:
            return max(self._frame_map.keys())
        return self.frames - 1

    def reset(self) -> None:
        if self._file_ is not None:
            self._file_.close()
        self._file_ = None
        self._dataset_ = None

    def close(self) -> None:
        """Release the open h5 handle (reference video.py:560)."""
        self.reset()

    def get_frame(self, idx: int) -> np.ndarray:
        ds = self._open()
        row = idx
        missing = False
        if self._frame_map is not None:
            if idx in self._frame_map:
                row = self._frame_map[idx]
            else:
                missing = True
        elif not 0 <= idx < ds.shape[0]:
            missing = True
        if missing:
            # Fall back to the original source video (reference
            # video.py:171-180, 380-395), else fail like an index error.
            if self.enable_source_video and self._source_video_dict is not None:
                return self.source_video.get_frame(idx)
            raise IndexError(f"Frame {idx} not embedded in {self.filename}.")
        frame = ds[row]
        if self._format_:
            import cv2

            frame = cv2.imdecode(np.frombuffer(np.asarray(frame).tobytes(), dtype="uint8"), cv2.IMREAD_UNCHANGED)
            # No channel flip: frames are encoded straight from RGB arrays
            # (both here and in the reference, video.py:1445 + 324), so
            # decode returns the original channel order.
            if frame.ndim == 2:
                frame = frame[..., None]
        else:
            if self.input_format == "channels_first":
                frame = np.transpose(frame, (1, 2, 0))
        if self.convert_range and np.max(frame) <= 1.0:
            frame = (frame * 255).astype(np.uint8)
        return frame


@attr.s(auto_attribs=True, eq=False)
class NumpyVideo:
    """Frames from an in-memory array or .npy file: (frames, H, W, C)."""

    filename: Union[str, np.ndarray] = attr.ib(default=None)

    EXTS = ("npy", "npz")

    _data_ = None

    def _data(self):
        if self._data_ is None:
            if isinstance(self.filename, np.ndarray):
                arr = self.filename
                self.filename = "numpy_video"
            else:
                arr = np.load(self.filename, mmap_mode="r")
            if arr.ndim == 3:
                arr = arr[..., None]
            self._data_ = arr
        return self._data_

    @property
    def test_frame(self):
        return self.get_frame(0)

    @property
    def frames(self) -> int:
        return self._data().shape[0]

    @property
    def height(self) -> int:
        return self._data().shape[1]

    @property
    def width(self) -> int:
        return self._data().shape[2]

    @property
    def channels(self) -> int:
        return self._data().shape[3]

    @property
    def dtype(self):
        return self._data().dtype

    def reset(self) -> None:
        pass

    def get_frame(self, idx: int) -> np.ndarray:
        return np.asarray(self._data()[idx])


@attr.s(auto_attribs=True, eq=False)
class SingleImageVideo:
    """One or more still images treated as video frames."""

    filename: Optional[str] = attr.ib(default=None)
    filenames: Optional[List[str]] = attr.ib(factory=list)
    height_: Optional[int] = None
    width_: Optional[int] = None
    channels_: Optional[int] = None
    grayscale: Optional[bool] = None

    EXTS = ("jpg", "jpeg", "png", "bmp", "tif", "tiff")

    _cache: Dict[int, np.ndarray] = attr.ib(factory=dict, init=False)

    def __attrs_post_init__(self):
        if not self.filenames and self.filename:
            self.filenames = [self.filename]
        if self.filename is None and self.filenames:
            self.filename = self.filenames[0]

    @property
    def test_frame(self) -> np.ndarray:
        return self.get_frame(0)

    @property
    def frames(self) -> int:
        return len(self.filenames)

    @property
    def height(self) -> int:
        return self.height_ or self.test_frame.shape[0]

    @property
    def width(self) -> int:
        return self.width_ or self.test_frame.shape[1]

    @property
    def channels(self) -> int:
        return self.channels_ or self.test_frame.shape[2]

    @property
    def dtype(self):
        return self.test_frame.dtype

    @property
    def is_grayscale(self) -> bool:
        if self.grayscale is None:
            frame = self.test_frame
            self.grayscale = bool(
                frame.shape[-1] == 1 or np.all(frame[..., 0] == frame[..., -1])
            )
        return self.grayscale

    def reset(
        self,
        filename: Optional[str] = None,
        filenames: Optional[List[str]] = None,
        grayscale: Optional[bool] = None,
    ) -> None:
        """Drop cached frames and optionally repoint at new image file(s)
        (reference video.py:528) — passing BOTH filename and filenames is
        ambiguous and raises."""
        if filename is not None and filenames:
            raise ValueError(
                "Cannot specify both filename and filenames on reset."
            )
        self._cache = {}
        self.height_ = self.width_ = self.channels_ = None
        if filename is not None:
            self.filename = filename
            self.filenames = [filename]
        elif filenames:
            self.filenames = list(filenames)
            self.filename = self.filenames[0]
        if grayscale is not None:
            self.grayscale = grayscale
        elif filename is not None or filenames:
            self.grayscale = None

    def get_frame(self, idx: int) -> np.ndarray:
        if idx not in self._cache:
            import cv2

            img = cv2.imread(self.filenames[idx], cv2.IMREAD_UNCHANGED)
            if img is None:
                raise KeyError(f"Unable to read image {self.filenames[idx]}.")
            if img.ndim == 2:
                img = img[..., None]
            elif img.shape[-1] >= 3:
                img = img[..., 2::-1]  # BGR(A) → RGB
            if self.grayscale:
                img = img[..., :1]
            self._cache[idx] = img
        return self._cache[idx]


@attr.s(auto_attribs=True, eq=False)
class ImgStoreVideo:
    """Frames stored as a loopbio ImgStore dataset (reference
    video.py:611-818). Uses the real ``imgstore`` package when installed;
    otherwise falls back to the vendored directory-store implementation in
    :mod:`sleap_tpu.io.dirimgstore` (PNG directory stores only)."""

    filename: str = ""
    index_by_original: bool = True

    def __attrs_post_init__(self):
        try:
            import imgstore  # noqa: F401
        except ImportError:
            from sleap_tpu.io import dirimgstore as imgstore
        self._store = imgstore.new_for_filename(self._store_path())
        self._img, (frame_number, _) = self._store.get_next_image()

    def _store_path(self) -> str:
        fn = self.filename
        if os.path.isdir(fn):
            fn = os.path.join(fn, "metadata.yaml")
        return fn

    @property
    def frames(self) -> int:
        return self._store.frame_count

    @property
    def height(self) -> int:
        return self._img.shape[0]

    @property
    def width(self) -> int:
        return self._img.shape[1]

    @property
    def channels(self) -> int:
        return 1 if self._img.ndim == 2 else self._img.shape[2]

    @property
    def dtype(self):
        return self._img.dtype

    @property
    def last_frame_idx(self) -> int:
        """Max ORIGINAL frame number when indexing by original frame numbers
        (reference video.py:715-726)."""
        if self.index_by_original:
            return self._store.frame_max
        return self.frames - 1

    def get_frame(self, idx: int) -> np.ndarray:
        if self.index_by_original:
            img, _ = self._store.get_image(frame_number=idx)
        else:
            img, _ = self._store.get_image(frame_number=None, frame_index=idx)
        if img.ndim == 2:
            img = img[..., None]
        return img


BackendType = Union[MediaVideo, HDF5Video, NumpyVideo, SingleImageVideo, DummyVideo]

_BACKEND_NAMES = {
    "MediaVideo": MediaVideo,
    "HDF5Video": HDF5Video,
    "NumpyVideo": NumpyVideo,
    "SingleImageVideo": SingleImageVideo,
    "DummyVideo": DummyVideo,
    "ImgStoreVideo": ImgStoreVideo,
}


@attr.s(auto_attribs=True, eq=False)
class Video:
    """Uniform frame access facade delegating to a concrete backend.

    Reference analog: ``/root/reference/sleap/io/video.py:1001``.
    """

    backend: BackendType = attr.ib()

    def __getattr__(self, name):
        # Delegate unknown attributes to the backend (reference video.py:1045).
        return getattr(self.backend, name)

    @property
    def num_frames(self) -> int:
        return self.backend.frames

    @property
    def last_frame_idx(self) -> int:
        # Embedded-frame backends override this with the max ORIGINAL frame
        # number (reference video.py:1054-1058).
        backend_idx = getattr(self.backend, "last_frame_idx", None)
        if backend_idx is not None:
            return backend_idx
        return self.num_frames - 1

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        return (
            self.backend.frames,
            self.backend.height,
            self.backend.width,
            self.backend.channels,
        )

    def __len__(self) -> int:
        return self.num_frames

    def __eq__(self, other) -> bool:
        if not isinstance(other, Video):
            return NotImplemented
        if type(self.backend) is not type(other.backend):
            return False
        fn_a = getattr(self.backend, "filename", None)
        fn_b = getattr(other.backend, "filename", None)
        if isinstance(fn_a, np.ndarray) or isinstance(fn_b, np.ndarray):
            # Numpy-backed videos: identity, not elementwise comparison.
            return fn_a is fn_b
        if fn_a != fn_b:
            return False
        # Same file can hold many videos (e.g. several embedded datasets in
        # one .pkg.slp) — distinguish by dataset when the backend has one.
        return getattr(self.backend, "dataset", None) == getattr(
            other.backend, "dataset", None
        )

    def __hash__(self) -> int:
        return id(self)

    def get_frame(self, idx: int) -> np.ndarray:
        """Read frame ``idx`` as (H, W, C) numpy array."""
        return self.backend.get_frame(idx)

    def get_frames(self, idxs: Union[int, Sequence[int]]) -> np.ndarray:
        if np.isscalar(idxs):
            idxs = [int(idxs)]
        return np.stack([self.get_frame(i) for i in idxs], axis=0)

    def get_frames_safely(self, idxs: Sequence[int]) -> Tuple[List[int], np.ndarray]:
        """Like get_frames but skips unreadable frames."""
        out_idxs, frames = [], []
        for i in idxs:
            try:
                frames.append(self.get_frame(i))
                out_idxs.append(i)
            except (KeyError, Exception):
                continue
        return out_idxs, (np.stack(frames, axis=0) if frames else None)

    def __getitem__(self, idxs):
        # Always rank-4, scalar index included — reference semantics
        # (video.py:1152; ``video[0].shape == (1, H, W, C)``).
        if isinstance(idxs, slice):
            start, stop, step = idxs.indices(self.num_frames)
            idxs = list(range(start, stop, step))
        return self.get_frames(idxs)

    @property
    def is_missing(self) -> bool:
        fn = getattr(self.backend, "filename", None)
        if fn is None or isinstance(fn, np.ndarray):
            return False
        if isinstance(self.backend, DummyVideo):
            return False
        return not os.path.exists(fn)

    # ------------------------------------------------------------------ #
    # Construction / serialization
    # ------------------------------------------------------------------ #
    @classmethod
    def from_filename(cls, filename: str, **kwargs) -> "Video":
        """Auto-detect the backend from the filename extension."""
        filename = fixup_path(filename)
        low = filename.lower()
        kwargs.pop("dummy", None)
        if low.endswith(HDF5Video.EXTS):
            kwargs = {
                k: v
                for k, v in kwargs.items()
                if k in ("dataset", "input_format", "convert_range")
            }
            backend = HDF5Video(filename=filename, **kwargs)
        elif low.endswith(NumpyVideo.EXTS):
            backend = NumpyVideo(filename=filename)
        elif low.endswith(MediaVideo.EXTS):
            kwargs = {k: v for k, v in kwargs.items() if k in ("grayscale", "bgr")}
            backend = MediaVideo(filename=filename, **kwargs)
        elif low.endswith(SingleImageVideo.EXTS):
            kwargs = {
                k: v
                for k, v in kwargs.items()
                if k in ("filenames", "height_", "width_", "channels_", "grayscale")
            }
            backend = SingleImageVideo(filename=filename, **kwargs)
        else:
            raise ValueError(f"Could not detect video backend for: {filename}")
        return cls(backend=backend)

    @classmethod
    def from_numpy(cls, data: np.ndarray) -> "Video":
        return cls(backend=NumpyVideo(filename=np.asarray(data)))

    @classmethod
    def from_media(cls, filename: str, **kwargs) -> "Video":
        """Media-file (mp4/avi) video (reference video.py:1209)."""
        kwargs = {k: v for k, v in kwargs.items() if k in ("grayscale", "bgr")}
        return cls(backend=MediaVideo(filename=fixup_path(filename), **kwargs))

    @classmethod
    def from_image_filenames(cls, filenames: List[str], **kwargs) -> "Video":
        return cls(backend=SingleImageVideo(filenames=list(filenames), **kwargs))

    @classmethod
    def from_hdf5(
        cls,
        dataset: str,
        filename: str,
        input_format: str = "channels_last",
        convert_range: bool = True,
    ) -> "Video":
        return cls(
            backend=HDF5Video(
                filename=filename,
                dataset=dataset,
                input_format=input_format,
                convert_range=convert_range,
            )
        )

    def to_hdf5(
        self,
        path: str,
        dataset: str,
        frame_numbers: Optional[List[int]] = None,
        format: str = "",
        index_by_original: bool = True,
    ) -> "Video":
        """Copy frames into an HDF5 dataset and return a Video over it.

        Matches the reference layout (video.py:1399-1492): raw frames at
        ``<dataset>/video`` (or per-frame encoded byte rows with
        format/height/width/channels attrs when ``format`` is given), the
        original frame numbers at ``<dataset>/frame_numbers``, and the source
        video's JSON under ``<dataset>/source_video``.
        """
        import json as _json

        import h5py

        if frame_numbers is None:
            frame_numbers = list(range(self.num_frames))
        frame_data = (
            self.get_frames(frame_numbers)
            if frame_numbers
            else np.zeros((1, 1, 1, 1))
        )

        with h5py.File(path, "a") as f:
            if format:
                import cv2

                encoded = []
                for img in frame_data:
                    ok, buf = cv2.imencode("." + format, img)
                    if not ok:
                        raise ValueError(f"Could not encode frame as {format}.")
                    encoded.append(np.squeeze(buf).astype("int8"))
                max_size = max((len(e) for e in encoded), default=0)
                dset = f.create_dataset(
                    dataset + "/video",
                    (len(encoded), max_size),
                    dtype="int8",
                    compression="gzip",
                )
                dset.attrs["format"] = format
                dset.attrs["channels"] = self.channels
                dset.attrs["height"] = self.height
                dset.attrs["width"] = self.width
                for i, e in enumerate(encoded):
                    dset[i, : len(e)] = e
            else:
                f.create_dataset(
                    dataset + "/video",
                    data=frame_data,
                    compression="gzip",
                    compression_opts=9,
                )
            if index_by_original:
                f.create_dataset(
                    dataset + "/frame_numbers",
                    data=np.asarray(frame_numbers, dtype=int),
                )
            grp = f.require_group(dataset + "/source_video")
            grp.attrs["json"] = _json.dumps(self.to_dict())

        return Video(
            backend=HDF5Video(
                filename=path,
                dataset=dataset + "/video",
                input_format="channels_last",
                convert_range=False,
            )
        )

    def to_imgstore(
        self,
        path: str,
        frame_numbers: Optional[List[int]] = None,
        format: str = "png",
        index_by_original: bool = True,
    ) -> "Video":
        """Copy frames into a loopbio ImgStore (reference video.py:1318-1397).
        Falls back to the vendored :mod:`sleap_tpu.io.dirimgstore` when the
        ``imgstore`` package is absent."""
        try:
            import imgstore
        except ImportError:
            from sleap_tpu.io import dirimgstore as imgstore
        if frame_numbers is None:
            frame_numbers = list(range(self.num_frames))
        store = imgstore.new_for_format(
            format,
            mode="w",
            basedir=path,
            imgshape=(self.height, self.width, self.channels),
            chunksize=1000,
        )
        import time

        for i in frame_numbers:
            store.add_image(self.get_frame(i), i, time.time())
        if not frame_numbers:
            store.add_image(
                np.zeros((self.height, self.width, self.channels), np.uint8),
                0,
                time.time(),
            )
        store.close()
        return Video(
            backend=ImgStoreVideo(filename=path, index_by_original=index_by_original)
        )

    @classmethod
    def from_dict(cls, d: Dict[str, Any], video_search=None) -> "Video":
        """Build from a serialized backend dict (the ``videos_json`` format).

        The serialized form is ``{"backend": {...fields...}}``; backend type
        is recovered from the filename extension plus field fingerprint,
        matching the reference's ``fixup_video`` (video.py:1549).
        """
        bd = dict(d.get("backend", d))
        bd.pop("backend", None)
        explicit = bd.pop("type", None)
        filename = bd.pop("filename", None) or bd.pop("file", None)
        if video_search is not None:
            filename = video_search(filename) or filename
        if explicit and explicit in _BACKEND_NAMES:
            bcls = _BACKEND_NAMES[explicit]
            fields = {f.name for f in attr.fields(bcls)}
            bd = {k: v for k, v in bd.items() if k in fields}
            return cls(backend=bcls(filename=filename, **bd))
        if bd.get("dummy"):
            return cls(backend=DummyVideo(filename=filename or "", **{
                k: v for k, v in bd.items()
                if k in ("height", "width", "frames", "channels", "dummy")
            }))
        if bd.get("filenames"):
            return cls(
                backend=SingleImageVideo(
                    filename=filename, filenames=bd["filenames"],
                    grayscale=bd.get("grayscale"),
                )
            )
        try:
            return cls.from_filename(filename, **bd)
        except ValueError:
            return cls(backend=DummyVideo(filename=filename or ""))

    def to_dict(self) -> Dict[str, Any]:
        b = self.backend
        d = attr.asdict(b, filter=lambda a, v: not a.name.startswith("_"))
        if isinstance(d.get("filename"), np.ndarray):
            d["filename"] = "numpy_video"
        d["type"] = type(b).__name__
        # Reference-compatible keys always present:
        d.setdefault("dataset", getattr(b, "dataset", "") or "")
        d.setdefault("input_format", getattr(b, "input_format", "") or "")
        return {"backend": d}

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @property
    def filename(self) -> str:
        fn = getattr(self.backend, "filename", "")
        return fn if isinstance(fn, str) else "numpy_video"

    def matches(self, other: "Video") -> bool:
        return self == other

    def __repr__(self) -> str:
        return (
            f"Video(filename={self.filename!r}, "
            f"backend={type(self.backend).__name__})"
        )


def load_video(
    filename: str,
    grayscale: Optional[bool] = None,
    dataset: Optional[str] = None,
    channels_first: bool = False,
    **kwargs,
) -> Video:
    """Open a video from disk (reference video.py:1638 ``load_video``).

    Supports media files (mp4/avi/...), HDF5 datasets (including embedded
    ``.slp`` images), numpy arrays, still images, and directories of images
    (each image becomes one frame).
    """
    if os.path.isdir(filename):
        files = sorted(
            os.path.join(filename, f)
            for f in os.listdir(filename)
            if f.lower().endswith(SingleImageVideo.EXTS)
        )
        if not files:
            raise ValueError(f"No images found in directory: {filename}")
        return Video(
            backend=SingleImageVideo(filenames=files, grayscale=grayscale)
        )
    if grayscale is not None:
        kwargs["grayscale"] = grayscale
    if dataset is not None:
        kwargs["dataset"] = dataset
    if channels_first:
        kwargs["input_format"] = "channels_first"
    return Video.from_filename(filename, **kwargs)


def fixup_path(path: str, search_paths: Optional[List[str]] = None) -> str:
    """Best-effort path resolution (reference video.py:1564 ``fixup_path``)."""
    if not isinstance(path, str) or os.path.exists(path):
        return path
    basename = os.path.basename(path)
    candidates = [os.path.join(os.getcwd(), basename)]
    for sp in search_paths or []:
        candidates.append(os.path.join(sp, basename))
        candidates.append(os.path.join(sp, path))
    for c in candidates:
        if os.path.exists(c):
            return c
    return path
