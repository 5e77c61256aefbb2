"""Entity linking / canonicalization (J4/J5/J8/J11): broadcast dictionary
joins with explicit skew mitigation.

The reference resolves identifiers by batched HTTP calls to BridgeDb
(`chemical_mapper.py:19-215`, `gene_mapper.py:397-534`) and by streaming
promapping.txt (`protein_ontology.py:137-169`). Here the same mappings are
dimension tables (FIXTURES.md §2) and every lookup is a broadcast hash join —
no network in the hot path at all.

Skew (north_rule): hot chemical entities (one CAS referenced by a large
fraction of stressors — e.g. formaldehyde) make the fan-out side of a shuffle
join skewed at 10^12 documents. ``salted_join`` replicates the small side
N_SALT ways and sprays the big side with ``pmod(hash(...), N_SALT)``, so no
single reducer owns a hot key. AQE skew-join splitting is also enabled
(session.py), but the salt keeps even first-attempt plans balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT_DEFAULT = 16


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = N_SALT_DEFAULT, how: str = "left") -> DataFrame:
    """Shuffle join with explicit hot-key salting.

    ``big`` gets a per-row salt; ``small`` is replicated n_salt times; the
    join key becomes (key, salt). Equivalent rows, balanced partitions.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                        F.lit(n_salt)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)])))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def link_chemical_xrefs(chemicals: DataFrame,
                        chem_xref_dim: DataFrame) -> DataFrame:
    """J4: CAS -> {chebi, chemspider, ...} arrays via broadcast join.

    The dimension is small by design (distinct CAS universe), so Catalyst
    picks a broadcast hash join — zero shuffle regardless of corpus size.
    Unmapped CAS (BridgeDb 'N/A') yield null arrays, coalesced to empty.
    """
    dbs = [c for c in chem_xref_dim.columns if c != "cas"]
    joined = chemicals.join(F.broadcast(chem_xref_dim),
                            chemicals["casrn"] == chem_xref_dim["cas"],
                            "left").drop("cas")
    for db in dbs:
        joined = joined.withColumn(
            db, F.coalesce(F.col(db), F.array().cast("array<string>")))
    # NOCAS chemicals are never sent to mapping (xml_parser.py:281-294)
    for db in dbs:
        joined = joined.withColumn(
            db, F.when(F.col("ident").startswith("cas:"), F.col(db))
                 .otherwise(F.array().cast("array<string>")))
    return joined


def link_gene_xrefs(genes_df: DataFrame, gene_xref_dim: DataFrame,
                    hgnc_col: str = "hgnc_id") -> DataFrame:
    """J8: hgnc:<n> -> ncbigene:/ensembl:/uniprot: CURIE arrays (order:
    entrez, ensembl, uniprot — gene_mapper.py:584-598)."""
    dim = gene_xref_dim.select(
        F.concat(F.lit("hgnc:"), "hgnc_id").alias(hgnc_col),
        F.transform("entrez", lambda x: F.concat(F.lit("ncbigene:"), x))
         .alias("xr_entrez"),
        F.transform("ensembl", lambda x: F.concat(F.lit("ensembl:"), x))
         .alias("xr_ensembl"),
        F.transform("uniprot", lambda x: F.concat(F.lit("uniprot:"), x))
         .alias("xr_uniprot"),
    )
    out = genes_df.join(F.broadcast(dim), hgnc_col, "left")
    for c in ("xr_entrez", "xr_ensembl", "xr_uniprot"):
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.array().cast("array<string>")))
    return out.withColumn(
        "xrefs", F.concat("xr_entrez", "xr_ensembl", "xr_uniprot"))


def link_promapping(bioobjs: DataFrame, promapping_dim: DataFrame) -> DataFrame:
    """J11: PR-term semi-join + target-id extraction
    (protein_ontology.py:137-169). Returns (pr_id, xref) long form, where
    xref order per line is HGNC, NCBIGene, UniProtKB (first comma token)."""
    prolist = (bioobjs.where(F.col("src") == "PR")
               .select(F.col("ident").alias("pr_id")).distinct())
    pm = promapping_dim.join(F.broadcast(prolist), "pr_id", "left_semi")
    extracted = pm.select(
        "pr_id",
        F.array(
            F.when(F.col("target").contains("HGNC:"),
                   F.concat(F.lit("hgnc:"),
                            F.regexp_extract("target", r"HGNC:([^,\t]+)", 1))),
            F.when(F.col("target").contains("NCBIGene:"),
                   F.concat(F.lit("ncbigene:"),
                            F.regexp_extract("target", r"NCBIGene:([^,\t]+)", 1))),
            F.when(F.col("target").contains("UniProtKB:"),
                   F.concat(F.lit("uniprot:"),
                            F.regexp_extract(
                                F.split_part("target", F.lit(","), F.lit(1)),
                                r"UniProtKB:(.+)", 1))),
        ).alias("ids"),
    )
    return (extracted
            .select("pr_id", F.explode("ids").alias("xref"))
            .where(F.col("xref").isNotNull()))
