"""Pure-Python extraction kernels (no Spark imports).

These functions are the single source of truth for extraction semantics:
the Spark operators in ``ocr_pipeline_spark.operators.extraction`` call
exactly this code inside Arrow-batched pandas UDFs, and the pytest golden
suite calls exactly this code standalone — so Spark output is
byte-identical to the oracle by construction (the north-rule contract).

Reference parity (watanka/ocr-pipeline, /root/reference):
- htmlkit.segment_html   ≈ CRAFT forward + getDetBoxes_core
  (std-detection/craft.py:58-80, std-detection/craft_utils.py:19-79):
  payload → scored candidate regions/blocks.
- classify.classify_blocks ≈ recognition + thresholds
  (std-detection/craft_utils.py:36-45, str-recognition/model.py:53-76):
  region scores → keep/drop decisions.
- materialize.materialize_text ≈ decode + post_process_text
  (str-recognition/utils.py:60-79, str-recognition/processor.py:159-180):
  kept blocks → final deterministic text.
- pdfkit ≈ the layout-analysis path the north rule adds (pdfminer-style
  char→line→block grouping; absent in the reference, SURVEY.md §2.7 K15).
"""
