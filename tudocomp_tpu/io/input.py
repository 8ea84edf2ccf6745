"""Input/Output source and sink abstractions.

Reference counterparts: ``io/Input.hpp:37-251`` (memory view / file /
istream sources with lazy slicing), ``io/Output.hpp:23-96``,
``io/MMapHandle.hpp`` (mmap-backed file views). Pythonic re-design:
``Input`` wraps bytes / a file path (mmap-backed, ``MADV_SEQUENTIAL``
where available) / a binary stream, offers ``as_view()`` (zero-copy
random access) and ``as_stream()`` (one-pass reader), and supports
``Input(other, from_, to)`` slicing like the reference's slice
constructor. ``Output`` targets a growable buffer, a file path, or a
binary stream.
"""

from __future__ import annotations

import io as _io
import mmap
import os
from typing import Optional, Union


class Input:
    def __init__(self, source: Union[bytes, bytearray, str, os.PathLike,
                                     _io.RawIOBase, "Input"],
                 from_: int = 0, to: Optional[int] = None):
        if isinstance(source, Input):
            view = source.as_view()
            self._data = view[from_: to if to is not None else len(view)]
            self._mmap = None
            return
        self._mmap = None
        if isinstance(source, (bytes, bytearray, memoryview)):
            data = memoryview(source)
        elif isinstance(source, (str, os.PathLike)):
            f = open(source, "rb")
            try:
                mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
                if hasattr(mm, "madvise"):
                    try:
                        mm.madvise(mmap.MADV_SEQUENTIAL)
                    except Exception:
                        pass
                self._mmap = mm
                data = memoryview(mm)
            except ValueError:  # empty file cannot be mmapped
                data = memoryview(f.read())
            finally:
                f.close()
        elif hasattr(source, "read"):
            data = memoryview(source.read())
        else:
            raise TypeError(f"unsupported input source: {type(source)}")
        end = to if to is not None else len(data)
        self._data = data[from_:end]

    def __len__(self) -> int:
        return len(self._data)

    def as_view(self) -> memoryview:
        """Zero-copy random-access view (reference ``as_view``)."""
        return self._data

    def as_bytes(self) -> bytes:
        return bytes(self._data)

    def as_stream(self) -> _io.BytesIO:
        """One-pass reader (reference ``as_stream``)."""
        return _io.BytesIO(self._data)

    def close(self) -> None:
        self._data = memoryview(b"")
        if self._mmap is not None:
            try:
                self._mmap.close()
            except BufferError:
                # a view from as_view() or a slice Input is still
                # alive; leave the mmap for GC instead of raising and
                # half-closing (the reference's InputAlloc pools
                # allocations for the same reason)
                return
            self._mmap = None


class Output:
    def __init__(self, target: Union[None, str, os.PathLike,
                                     _io.RawIOBase] = None):
        self._path = None
        self._stream = None
        if target is None:
            self._buf = bytearray()
        elif isinstance(target, (str, os.PathLike)):
            self._path = target
            self._buf = bytearray()
        elif hasattr(target, "write"):
            self._stream = target
            self._buf = None
        else:
            raise TypeError(f"unsupported output target: {type(target)}")

    def write(self, data: bytes) -> int:
        if self._stream is not None:
            return self._stream.write(data)
        self._buf += data
        return len(data)

    def getvalue(self) -> bytes:
        if self._buf is None:
            raise ValueError("stream-backed output has no buffer")
        return bytes(self._buf)

    def close(self) -> None:
        if self._path is not None:
            with open(self._path, "wb") as f:
                f.write(self._buf)
        elif self._stream is not None:
            self._stream.flush()

    # context-manager support: a path-backed Output only materializes
    # its file in close(), so make closing structural
    def __enter__(self) -> "Output":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.close()
