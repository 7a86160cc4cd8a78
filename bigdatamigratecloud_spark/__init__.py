"""PySpark-native data-migration and analytics engine.

A brand-new engine with the capabilities of the reference
(YevgenKarpinka/BigDataMigrateCloud — a Dynamics 365 BC "RapidStart"
data-migration extension; see SURVEY.md), re-expressed Spark-first:

- one ingest path: everything normalizes to a long (EAV) staging DataFrame,
  as the reference normalizes everything to XML packages
  (ref: Codeunit 60000:706-798);
- one apply path: validate -> pivot long->wide -> write
  (ref: Codeunit 60000:527, 763-785);
- one export path: select -> format -> serialize (XML+gzip / xlsx)
  (ref: Codeunit 60000:158-251, 289-302).

Plus LLM-data-pipeline operators (dedup, similarity search, multimodal
binary columns, text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"
