"""Composable DataFrame operators.

Each module maps to a SURVEY.md §2 section:

- ``relational``   E5 relational completeness wrappers + the join/agg
                   patterns (J1/J2/J4/J5/J9, A1/A2/A4/A5/A6, U1/U3, O1).
- ``synonymizer``  the node-synonymizer query family (EP3).
- ``drugbank``     DrugBank record extraction (EP1 front half).
- ``ner``          the NER stage (X1 UDF + J7/A2/A3/U1 merges).
- ``identifiers``  EP2 identifier alignment (F7 + J8 + A6).
- ``dedup``        E1 exact/near dedup (hash, MinHash-LSH, SimHash, Jaccard).
- ``similarity``   E2 embedding similarity search (cosine top-k, LSH).
- ``textanalysis`` E3 language-ID, quality scoring, token stats, fingerprints.
- ``multimodal``   E4 binary-column plumbing (decode stubbed).
"""
