"""Declarative source registry.

The reference keeps its ingestion metadata in PostgreSQL ``meta.*``
tables seeded by a script (reference ``scripts/seed_data.py:24-509``)
plus a hard-coded table registry (``app/services/ingestor.py:27-93``).
Here the same content is plain Python data — it both drives the Spark
pipeline (schema resolution, transform dispatch, dedup keys) and can be
materialized as the small ``meta`` parquet tables for SQL access.

Logical types: TEXT, NUMERIC, INTEGER, DATE, BOOLEAN
(reference ``transformers.py:143-172``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

SPARK_TYPES = {
    "TEXT": T.StringType(),
    "NUMERIC": T.DoubleType(),
    "INTEGER": T.IntegerType(),
    "DATE": T.DateType(),
    "BOOLEAN": T.BooleanType(),
}


@dataclass(frozen=True)
class CanonicalColumn:
    """One target column of a source (reference ``seed_data.py:128-404``)."""

    internal_name: str
    display_name: str
    data_type: str  # TEXT | NUMERIC | INTEGER | DATE | BOOLEAN
    is_nullable: bool = True
    is_required: bool = False  # required to be present in the *file header*
    display_order: int = 0
    #: accepted file-header spellings (reference ``seed_data.py:413-509``);
    #: empty ⇒ derived column, never mapped from a file header (e.g. mai_id,
    #: mac_locality on PFS_LOCALITY).
    source_headers: tuple[str, ...] = ()

    @property
    def spark_type(self) -> T.DataType:
        return SPARK_TYPES[self.data_type]


@dataclass(frozen=True)
class Source:
    """One ingestible data source (reference ``seed_data.py:24-117`` +
    ``ingestor.py:27-93``)."""

    source_code: str
    source_name: str
    category: str
    target_table: str
    update_frequency: str
    display_order: int
    unique_keys: tuple[str, ...]
    columns: tuple[CanonicalColumn, ...]
    #: NCCI PTP ships as Hospital/Practitioner variants, multi-part files
    variants: tuple[str, ...] = ()
    multipart: bool = False

    def column(self, internal_name: str) -> CanonicalColumn:
        for c in self.columns:
            if c.internal_name == internal_name:
                return c
        raise KeyError(internal_name)

    @property
    def header_mappings(self) -> dict[str, dict]:
        """``{internal_name: {"headers": [...], "is_required": bool}}`` for
        header detection — only columns that can appear in a file header
        (mirrors the inner join at reference ``upload.py:68-86``)."""
        return {
            c.internal_name: {"headers": list(c.source_headers), "is_required": c.is_required}
            for c in self.columns
            if c.source_headers
        }

    @property
    def spark_schema(self) -> T.StructType:
        """Typed output schema (plus the version FK added by the sink)."""
        return T.StructType(
            [T.StructField(c.internal_name, c.spark_type, True) for c in self.columns]
        )


def _col(
    name: str,
    display: str,
    dtype: str,
    headers: tuple[str, ...],
    required: bool = False,
    nullable: bool = True,
    order: int = 0,
) -> CanonicalColumn:
    return CanonicalColumn(
        internal_name=name,
        display_name=display,
        data_type=dtype,
        is_nullable=nullable,
        is_required=required,
        display_order=order,
        source_headers=headers,
    )


def _mue_columns(mue_headers: tuple[str, ...]) -> tuple[CanonicalColumn, ...]:
    return (
        _col("hcpcs_code", "HCPCS Code", "TEXT",
             ("HCPCS/CPT Code", "HCPCS Code", "CPT/HCPCS Code", "HCPCS", "CPT Code"),
             required=True, nullable=False, order=10),
        _col("mue_value", "MUE Value", "INTEGER", mue_headers,
             required=True, nullable=False, order=20),
        _col("mai_id", "MAI ID", "INTEGER", (), order=30),  # derived from mai_description
        _col("mai_description", "MAI Description", "TEXT",
             ("MUE Adjudication Indicator", "MAI", "Adjudication Indicator"),
             required=True, order=40),
        _col("mue_rationale", "MUE Rationale", "TEXT",
             ("MUE Rationale", "Rationale", "MUE Rationale Code"), order=50),
    )


SOURCES: dict[str, Source] = {
    s.source_code: s
    for s in [
        Source(
            source_code="PFS_RVU",
            source_name="PFS - Relative Value Units",
            category="Physician Fee Schedule",
            target_table="pfs_rvu",
            update_frequency="QUARTERLY",
            display_order=10,
            unique_keys=("hcpcs_code", "modifier"),
            columns=(
                _col("hcpcs_code", "HCPCS Code", "TEXT",
                     ("HCPCS", "HCPC", "CPT", "HCPCS CODE", "PROCEDURE CODE"),
                     required=True, nullable=False, order=10),
                _col("modifier", "Modifier", "TEXT", ("MOD", "MODIFIER", "MOD."), order=20),
                _col("description", "Description", "TEXT",
                     ("DESCRIPTION", "DESC", "DESCRIPTOR", "SHORT DESCRIPTION"), order=30),
                _col("status_code", "Status Code", "TEXT",
                     ("STATUS CODE", "STATUS", "STAT", "STS"), order=40),
                _col("work_rvu", "Work RVU", "NUMERIC",
                     ("WORK RVU", "WORK_RVU", "WRVU", "PHYSICIAN WORK"), order=50),
                _col("non_fac_pe_rvu", "Non-Facility PE RVU", "NUMERIC",
                     ("NON-FAC PE RVU", "NON-FACILITY PE RVU", "NFPE RVU",
                      "NON FAC PE RVU", "FULLY IMPL NON-FAC PE RVUS"), order=60),
                _col("facility_pe_rvu", "Facility PE RVU", "NUMERIC",
                     ("FAC PE RVU", "FACILITY PE RVU", "FPE RVU", "FAC_PE_RVU",
                      "FULLY IMPL FAC PE RVUS"), order=70),
                _col("mp_rvu", "Malpractice RVU", "NUMERIC",
                     ("MP RVU", "MALPRACTICE RVU", "MAL PRAC RVU", "MPRVU", "MALPRACTICE"),
                     order=80),
                _col("non_fac_total", "Non-Facility Total", "NUMERIC",
                     ("NON-FAC TOTAL", "NON-FACILITY TOTAL", "NF TOTAL"), order=90),
                _col("facility_total", "Facility Total", "NUMERIC",
                     ("FAC TOTAL", "FACILITY TOTAL", "FAC_TOTAL"), order=100),
                _col("pctc_indicator", "PC/TC Indicator", "TEXT",
                     ("PCTC IND", "PC/TC IND", "PCTC INDICATOR", "PC/TC INDICATOR"), order=110),
                _col("global_days", "Global Period", "TEXT",
                     ("GLOB DAYS", "GLOBAL DAYS", "GLOBAL PERIOD", "GLOB"), order=120),
                _col("conversion_factor", "Conversion Factor", "NUMERIC",
                     ("CONV FACTOR", "CF", "CONVERSION FACTOR", "GPCI CF"), order=130),
            ),
        ),
        Source(
            source_code="PFS_GPCI",
            source_name="PFS - Geographic Practice Cost Index",
            category="Physician Fee Schedule",
            target_table="pfs_gpci",
            update_frequency="ANNUAL",
            display_order=20,
            unique_keys=("mac_locality",),
            columns=(
                _col("mac_locality", "MAC Locality", "TEXT",
                     ("MAC LOCALITY", "LOCALITY", "CARRIER LOCALITY", "MAC/LOCALITY"),
                     required=True, nullable=False, order=10),
                _col("locality_name", "Locality Name", "TEXT",
                     ("LOCALITY NAME", "NAME", "LOCALITY DESCRIPTION"), order=20),
                _col("work_gpci", "Work GPCI", "NUMERIC",
                     ("WORK GPCI", "PW GPCI", "WORK", "PHYSICIAN WORK GPCI"),
                     required=True, nullable=False, order=30),
                _col("pe_gpci", "PE GPCI", "NUMERIC",
                     ("PE GPCI", "PRACTICE EXPENSE GPCI", "PE", "PRACTICE EXPENSE"),
                     required=True, nullable=False, order=40),
                _col("mp_gpci", "MP GPCI", "NUMERIC",
                     ("MP GPCI", "MALPRACTICE GPCI", "MP", "PLI GPCI"),
                     required=True, nullable=False, order=50),
            ),
        ),
        Source(
            source_code="PFS_LOCALITY",
            source_name="PFS - Locality Mapping",
            category="Physician Fee Schedule",
            target_table="pfs_locality",
            update_frequency="ANNUAL",
            display_order=30,
            unique_keys=("state_code", "county_code", "carrier_number", "locality_code"),
            columns=(
                _col("state_code", "State Code", "TEXT", ("STATE", "STATE CODE", "ST"),
                     required=True, nullable=False, order=10),
                _col("county_code", "County Code", "TEXT",
                     ("COUNTY CODE", "FIPS", "FIPS CODE"), order=20),
                _col("county_name", "County Name", "TEXT", ("COUNTY", "COUNTY NAME"), order=30),
                _col("carrier_number", "Carrier Number", "TEXT",
                     ("CARRIER", "CARRIER NUMBER", "MAC", "MAC NUMBER"),
                     required=True, nullable=False, order=40),
                _col("locality_code", "Locality Code", "TEXT",
                     ("LOCALITY", "LOCALITY CODE", "LOC"),
                     required=True, nullable=False, order=50),
                # derived: carrier_number || locality_code when absent in file
                _col("mac_locality", "MAC Locality", "TEXT",
                     ("MAC LOCALITY", "CARRIER LOCALITY"), order=60),
            ),
        ),
        Source(
            source_code="PFS_ANES_CF",
            source_name="PFS - Anesthesia Conversion Factor",
            category="Physician Fee Schedule",
            target_table="pfs_anes_cf",
            update_frequency="ANNUAL",
            display_order=40,
            unique_keys=("mac_locality",),
            columns=(
                _col("mac_locality", "MAC Locality", "TEXT",
                     ("MAC LOCALITY", "LOCALITY", "CARRIER LOCALITY"),
                     required=True, nullable=False, order=10),
                _col("locality_name", "Locality Name", "TEXT", ("LOCALITY NAME", "NAME"), order=20),
                _col("anes_conversion_factor", "Anesthesia CF", "NUMERIC",
                     ("ANESTHESIA CF", "ANES CF", "CONVERSION FACTOR", "CF"),
                     required=True, nullable=False, order=30),
            ),
        ),
        Source(
            source_code="PFS_OPPS_CAP",
            source_name="PFS - OPPS Imaging Cap",
            category="Physician Fee Schedule",
            target_table="pfs_opps_cap",
            update_frequency="QUARTERLY",
            display_order=50,
            unique_keys=("hcpcs_code",),
            columns=(
                _col("hcpcs_code", "HCPCS Code", "TEXT",
                     ("HCPCS", "HCPC", "HCPCS CODE", "CODE"),
                     required=True, nullable=False, order=10),
                _col("opps_cap_amount", "OPPS Cap Amount", "NUMERIC",
                     ("OPPS CAP", "CAP AMOUNT", "OPPS CAP AMOUNT", "CAP"),
                     required=True, nullable=False, order=20),
            ),
        ),
        Source(
            source_code="HCPCS",
            source_name="HCPCS Level II Codes",
            category="HCPCS",
            target_table="hcpcs_codes",
            update_frequency="QUARTERLY",
            display_order=60,
            unique_keys=("hcpcs_code",),
            columns=(
                _col("hcpcs_code", "HCPCS Code", "TEXT",
                     ("HCPC", "HCPCS", "HCPCS CODE", "CODE"),
                     required=True, nullable=False, order=10),
                _col("short_description", "Short Description", "TEXT",
                     ("SHORT DESCRIPTION", "SHORT DESC", "SHORTDESCRIPTION"), order=20),
                _col("long_description", "Long Description", "TEXT",
                     ("LONG DESCRIPTION", "LONG DESC", "LONGDESCRIPTION", "DESCRIPTION"),
                     order=30),
                _col("add_date", "Add Date", "DATE", ("ADD DT", "ADD DATE", "ADDED DATE"),
                     order=40),
                _col("effective_date", "Effective Date", "DATE",
                     ("ACT EFF DT", "EFFECTIVE DATE", "EFF DATE", "ACTION EFFECTIVE DATE"),
                     order=50),
                _col("termination_date", "Termination Date", "DATE",
                     ("TERM DT", "TERMINATION DATE", "TERM DATE", "END DATE"), order=60),
                _col("betos_code", "BETOS Code", "TEXT", ("BETOS", "BETOS CODE", "TOS"),
                     order=70),
                _col("coverage_code", "Coverage Code", "TEXT",
                     ("COV", "COVERAGE", "COV CODE", "COVERAGE CODE"), order=80),
            ),
        ),
        Source(
            source_code="NCCI_PTP",
            source_name="NCCI PTP Edits",
            category="NCCI Edits",
            target_table="ncci_ptp",
            update_frequency="QUARTERLY",
            display_order=70,
            unique_keys=("comprehensive_code", "component_code"),
            variants=("practitioner", "hospital"),
            multipart=True,
            columns=(
                _col("comprehensive_code", "Comprehensive Code", "TEXT",
                     ("Column 1", "Column1", "COLUMN 1", "CODE 1", "COMPREHENSIVE CODE"),
                     required=True, nullable=False, order=10),
                _col("component_code", "Component Code", "TEXT",
                     ("Column 2", "Column2", "COLUMN 2", "CODE 2", "COMPONENT CODE"),
                     required=True, nullable=False, order=20),
                _col("modifier_indicator", "Modifier Indicator", "INTEGER",
                     ("Modifier", "MODIFIER", "MOD IND", "MODIFIER INDICATOR",
                      "Modifier 0=not allowed"),
                     required=True, nullable=False, order=30),
                _col("effective_date", "Effective Date", "DATE",
                     ("Effective Date", "EffectiveDate", "EFFECTIVE DATE", "EFF DATE",
                      "EFF_DATE"),
                     required=True, nullable=False, order=40),
                _col("deletion_date", "Deletion Date", "DATE",
                     ("Deletion Date", "DeletionDate", "DELETION DATE", "DEL DATE",
                      "DEL_DATE", "END DATE"), order=50),
                _col("rationale", "PTP Edit Rationale", "TEXT",
                     ("PTP Edit Rationale", "Rationale", "RATIONALE", "PTP RATIONALE",
                      "EDIT RATIONALE"), order=60),
                _col("prior_1996_flag", "Prior to 1996 Flag", "BOOLEAN",
                     ("*=in existence prior to 1996", "*=IN EXISTENCE", "PRIOR 1996",
                      "PRE-1996"), order=70),
            ),
        ),
        Source(
            source_code="NCCI_MUE_DME",
            source_name="NCCI MUE - DME Supplier",
            category="NCCI Edits",
            target_table="ncci_mue",
            update_frequency="QUARTERLY",
            display_order=81,
            unique_keys=("hcpcs_code",),
            columns=_mue_columns(
                ("DME Supplier Services MUE Values", "DME MUE Values", "MUE Values",
                 "DME Supplier MUE")
            ),
        ),
        Source(
            source_code="NCCI_MUE_PRAC",
            source_name="NCCI MUE - Practitioner",
            category="NCCI Edits",
            target_table="ncci_mue",
            update_frequency="QUARTERLY",
            display_order=82,
            unique_keys=("hcpcs_code",),
            columns=_mue_columns(
                ("Practitioner Services MUE Values", "Practitioner MUE Values",
                 "MUE Values", "Practitioner MUE")
            ),
        ),
        Source(
            source_code="NCCI_MUE_OPH",
            source_name="NCCI MUE - Outpatient Hospital",
            category="NCCI Edits",
            target_table="ncci_mue",
            update_frequency="QUARTERLY",
            display_order=83,
            unique_keys=("hcpcs_code",),
            columns=_mue_columns(
                ("Outpatient Hospital Services MUE Values",
                 "Outpatient Hospital MUE Values", "Hospital MUE Values", "MUE Values")
            ),
        ),
    ]
}


def get_source(source_code: str) -> Source:
    try:
        return SOURCES[source_code.upper()]
    except KeyError:
        raise KeyError(f"Data source not found: {source_code}") from None


#: view-name suffix for the three MUE sources that SHARE the ncci_mue
#: fact table — the reference names its per-source views after the
#: service category, not the source code (``init_db.py:496-517``:
#: NCCI_MUE_OPH = "Outpatient Hospital" ⇒ ncci_mue_hospital_current)
MUE_VIEW_SUFFIX = {
    "NCCI_MUE_DME": "dme",
    "NCCI_MUE_PRAC": "practitioner",
    "NCCI_MUE_OPH": "hospital",
}


def current_view_specs() -> list[tuple[str, str, "str | None"]]:
    """``(view_name, source_code, variant)`` triples reproducing the
    reference's EXACT 11-view catalog (``init_db.py:424-517``):

    * one ``{table}_current`` view per single-table source (PFS_RVU,
      PFS_GPCI, PFS_LOCALITY, PFS_ANES_CF, PFS_OPPS_CAP, HCPCS);
    * one ``{table}_{variant}_current`` view per NCCI_PTP VARIANT
      (hospital / practitioner) — the reference never merges variants
      into one view, because the PTP bundling check (SCHEMA.md:269-277)
      reads exactly one service category;
    * one ``{table}_{suffix}_current`` view per MUE SOURCE (dme /
      practitioner / hospital) — three sources share the ncci_mue fact
      table, disambiguated by the version rows' source_code.

    Deduping by ``target_table`` here (the pre-round-9 bug) collapsed
    the three MUE views into one bound to whichever source registered
    first and merged the two PTP variants — practitioner/hospital MUE
    rows were unreachable through the catalog.
    """
    specs: list[tuple[str, str, "str | None"]] = []
    for source in SOURCES.values():
        if source.variants:
            for v in source.variants:
                specs.append(
                    (f"{source.target_table}_{v}_current", source.source_code, v)
                )
        elif source.source_code in MUE_VIEW_SUFFIX:
            specs.append(
                (
                    f"{source.target_table}_{MUE_VIEW_SUFFIX[source.source_code]}_current",
                    source.source_code,
                    None,
                )
            )
        else:
            specs.append((f"{source.target_table}_current", source.source_code, None))
    return specs
