"""AudioFile framework (oracle). SURVEY.md §2 #1.

Oracle counterpart of the reference's ``audiofile.py``: a mutable
``CodingParams`` attribute bag threaded through every call, and an abstract
block-oriented file base class with the open → read-header → block loop →
close lifecycle (SURVEY.md §1 "public interface").
"""

from __future__ import annotations


class CodingParams:
    """Mutable attribute bag (the reference's coding-state object)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class AudioFile:
    """Abstract block-oriented audio file."""

    def __init__(self, filename: str):
        self.filename = filename
        self.fp = None

    def OpenForReading(self) -> CodingParams:
        self.fp = open(self.filename, "rb")
        return self.ReadFileHeader()

    def OpenForWriting(self, codingParams: CodingParams) -> None:
        self.fp = open(self.filename, "wb")
        self.WriteFileHeader(codingParams)

    def Close(self, codingParams: CodingParams) -> None:
        if self.fp:
            self.fp.close()
            self.fp = None

    # subclass responsibilities
    def ReadFileHeader(self) -> CodingParams:
        raise NotImplementedError

    def WriteFileHeader(self, codingParams: CodingParams) -> None:
        raise NotImplementedError

    def ReadDataBlock(self, codingParams: CodingParams):
        raise NotImplementedError

    def WriteDataBlock(self, data, codingParams: CodingParams) -> None:
        raise NotImplementedError
