"""webx — a PySpark-native main-content extraction engine for web pages.

Recasts the two-stage detect-then-recognize OCR design of the reference
(jianyunchao/mindocr; see /root/repo/SURVEY.md) as a two-stage webtext
extractor over Common-Crawl-style page tables:

* stage 1 (``webx.detect``) — block-level boilerplate classifier: an
  lxml-free byte-stream tokenizer (``webx.tokenize``) produces a block
  table per document; per-block text-density / link-density scores are
  thresholded and contiguous high-score runs merged into scored byte
  spans (the ``DBPostprocess`` analog,
  reference mindocr/postprocess/det_postprocess.py:13-145).
* stage 2 (``webx.recognize``) — span decoder: slice surviving byte
  spans, strip markup tokens, decode entities, collapse whitespace and
  join in document order (the ``RecCTCLabelDecode`` analog,
  reference mindocr/postprocess/rec_postprocess.py:75-142).

Everything is expressed in ``pyspark.sql`` DataFrames; per-document
work runs inside Arrow-batched ``mapInPandas`` (no row-at-a-time Spark
UDFs). See ``webx.pipeline`` for the end-to-end job and
``webx.lineage`` for partition-granular checkpoint/resume.
"""

from webx.config import ExtractConfig
from webx.pipeline import run_detect, run_extraction

__all__ = ["ExtractConfig", "run_detect", "run_extraction"]
__version__ = "0.3.0"
