"""mashspark — a from-scratch PySpark-native near-duplicate detection and
clustering engine with the query semantics of marbl/Mash (bottom-k MinHash
sketching, Mash distance, containment screening), applied to web text.

Layering (SURVEY.md §7):

* numpy core, no Spark:  ``hashing`` ``minhash`` ``compare`` (``dna`` is
  golden-test-only DNA support)
* Spark DataFrame layer: ``sketch`` (vectorized pandas UDFs), ``lsh``
  (banded candidate join + skew salting), ``verify`` (Mash-exact pair
  verification), ``cc`` (large/small-star connected components),
  ``screen`` (containment), ``pipeline`` (end-to-end dedup),
  ``io`` (checkpoint/resume manifest)
* training-data extras: ``textstats`` ``simhash`` ``ann`` ``multimodal``
  ``urls`` ``extract`` ``repetition`` ``decontam`` ``packing``
  ``sampling`` ``pii`` ``lm`` ``backoff`` ``keywords`` ``classify``
  ``bloom`` ``dsir`` ``bpe`` ``normalize`` ``profile`` ``streaming``
"""

from .params import SketchParams, LSHParams, PipelineConfig

__all__ = ["SketchParams", "LSHParams", "PipelineConfig"]
__version__ = "0.1.0"
