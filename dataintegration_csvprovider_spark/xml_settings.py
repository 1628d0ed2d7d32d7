"""XML job-settings importer — migration fidelity for reference config.

The reference round-trips provider configuration as XML: the element
form written by ``ISource/IDestination.SaveAsXml`` and read back by the
``CsvProvider(XmlNode)`` constructor (CSVProvider.cs:317-351,363-454),
and the ``Serialize()`` parameter-node form (CSVProvider.cs:497-517).
The engine's native round-trip is JSON (jobs.JobSpec, the documented J3
design swap) — this module is the migration bridge: parse either XML
shape into the engine's dataclasses (so a user migrating real
Dynamicweb job files gets their settings without hand-translation), and
export a JobSpec back to the SaveAsXml element form
(:func:`jobspec_to_xml` — import∘export is the identity on every
setting the reference constructor reads, pinned by test).

Faithful quirks reproduced from the reference reader:

- boolean cells compare against the literal string ``"True"``
  (``node.FirstChild.Value == "True"``, CSVProvider.cs:417,423,441,…) —
  ``"true"`` is falsy there, so it is falsy here;
- the decimal-separator sentinels are the UI strings ``"Use system
  culture"`` (the constructor's default, CSVProvider.cs:365 via
  ``_noneDecimalSeparator``, :31) and ``"Detect automatically"``
  (``_detectAutomaticallySeparator``, :30) — mapped to the engine's
  ``"system"`` / ``"auto"`` modes;
- encodings resolve by substring, exactly like ``GetEncoding``
  (CSVProvider.cs:603-616): contains ``1252`` → cp1252, ``1251`` →
  cp1251, ``UTF16`` → UTF-16, anything else → UTF-8;
- empty elements leave the default untouched (every case guards on
  ``node.HasChildNodes``);
- an embedded ``<Schema>`` node is parsed tolerantly (the Schema XML
  shape belongs to the external Dynamicweb.DataIntegration framework,
  not the reference repo): any descendant ``Table``/``Column`` elements
  contribute name lists, via a ``Name`` attribute or child element.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from .jobs import JobSpec
from .sinks.csv_sink import CsvSink, CsvSinkOptions
from .sources.csv_source import CsvSource, CsvSourceOptions

#: reference UI sentinels (CSVProvider.cs:30-31)
NONE_DECIMAL_SEPARATOR = "Use system culture"
DETECT_AUTOMATICALLY_SEPARATOR = "Detect automatically"


def _ref_bool(text: str | None, default: bool) -> bool:
    """The reference's boolean read: exact ``"True"`` only
    (CSVProvider.cs:417 etc.); empty nodes keep the default."""
    if text is None or text == "":
        return default
    return text == "True"


def _ref_encoding(text: str | None) -> str:
    """Substring-dispatch encoding resolution (CSVProvider.cs:603-616)."""
    if text:
        if "1252" in text:
            return "windows-1252"
        if "1251" in text:
            return "windows-1251"
        if "UTF16" in text:
            return "UTF-16"
    return "UTF-8"


def _ref_decimal_mode(text: str | None) -> str:
    """UI sentinel → engine decimal-separator mode (CSVProvider.cs:719-727
    options; GetReader derivation at :468-476)."""
    if text is None or text == "" or text == NONE_DECIMAL_SEPARATOR:
        return "system"
    if text == DETECT_AUTOMATICALLY_SEPARATOR:
        return "auto"
    return text  # explicit "." or ","


@dataclass
class ImportedSettings:
    """Flat view of every element the reference constructor reads
    (CSVProvider.cs:363-454), engine-normalized."""

    source_field_delimiter: str = ";"  # CSVProvider.cs:34 default
    destination_field_delimiter: str = ";"
    quote_char: str = '"'  # CSVProvider.cs:35 default
    source_path: str = ""
    source_file: str = ""
    destination_path: str = ""
    source_first_row_contains_column_names: bool = True
    destination_first_row_contains_column_names: bool = True
    destination_encoding: str = "UTF-8"
    source_decimal_separator: str = "system"
    delete_source_files: bool = False
    include_timestamp_in_filename: bool = False
    ignore_defective_rows: bool = False
    #: tolerant <Schema> parse: table name -> ordered column names
    schema_tables: dict[str, list[str]] = field(default_factory=dict)


def parse_provider_xml(xml: str) -> ImportedSettings:
    """Parse the element-form provider node (the shape ``SaveAsXml``
    writes and ``CsvProvider(XmlNode)`` reads, CSVProvider.cs:317-351 /
    :363-454). Unknown elements are ignored, like the reference's
    switch."""
    root = ET.fromstring(xml)
    s = ImportedSettings()
    for node in root:
        text = node.text
        has = text is not None and text != ""
        if node.tag == "SourceFieldDelimiter" and has:
            s.source_field_delimiter = text
        elif node.tag == "DestinationFieldDelimiter" and has:
            s.destination_field_delimiter = text
        elif node.tag == "QuoteChar" and has:
            s.quote_char = text
        elif node.tag == "SourcePath" and has:
            s.source_path = text
        elif node.tag == "SourceFile" and has:
            s.source_file = text
        elif node.tag == "DestinationPath" and has:
            s.destination_path = text
        elif node.tag == "SourceFirstRowContainsColumnNames":
            s.source_first_row_contains_column_names = _ref_bool(text, True)
        elif node.tag == "DestinationFirstRowContainsColumnNames":
            s.destination_first_row_contains_column_names = _ref_bool(text, True)
        elif node.tag == "DestinationEncoding" and has:
            s.destination_encoding = _ref_encoding(text)
        elif node.tag == "SourceDecimalSeparator":
            s.source_decimal_separator = _ref_decimal_mode(text)
        elif node.tag == "DeleteSourceFiles":
            s.delete_source_files = _ref_bool(text, False)
        elif node.tag == "IncludeTimestampInFileName":
            s.include_timestamp_in_filename = _ref_bool(text, False)
        elif node.tag == "IgnoreDefectiveRows":
            s.ignore_defective_rows = _ref_bool(text, False)
        elif node.tag == "Schema":
            s.schema_tables = _parse_schema_node(node)
    return s


def _parse_schema_node(node: ET.Element) -> dict[str, list[str]]:
    """Best-effort Schema walk: the exact Schema XML lives in the
    external framework package, so accept any Table/Column nesting with
    names as attribute or child element."""

    def name_of(el: ET.Element) -> str | None:
        if el.get("Name") or el.get("name"):
            return el.get("Name") or el.get("name")
        # NB: explicit None checks — ET.Element truthiness is len(children)
        child = el.find("Name")
        if child is None:
            child = el.find("name")
        if child is not None and child.text:
            return child.text
        return None

    tables: dict[str, list[str]] = {}
    for tbl in node.iter("Table"):
        tname = name_of(tbl)
        if not tname:
            continue
        cols = [c for c in (name_of(col) for col in tbl.iter("Column")) if c]
        tables[tname] = cols
    return tables


def parse_parameters_xml(xml: str) -> ImportedSettings:
    """Parse the ``Serialize()`` parameter-node form
    (CSVProvider.cs:497-517): a ``<Parameters>`` root whose children
    carry a parameter label and value — accepted as attributes
    (``name=''/value=''`` in any casing) or as ``Name``/``Value`` child
    elements, since ``CreateParameterNode`` belongs to the external
    framework."""
    root = ET.fromstring(xml)
    s = ImportedSettings()

    def kv(el: ET.Element) -> tuple[str | None, str | None]:
        name = el.get("name") or el.get("Name") or el.get("key") or el.get("Key")
        value = el.get("value") or el.get("Value")
        if name is None:
            n = el.find("Name")
            if n is None:
                n = el.find("Key")
            if n is not None:
                name = n.text
        if value is None:
            v = el.find("Value")
            if v is not None:
                value = v.text
        return name, value

    # labels exactly as Serialize() writes them (CSVProvider.cs:502-515)
    for el in root:
        name, value = kv(el)
        if name is None:
            continue
        if name == "First row in source files contains column names":
            s.source_first_row_contains_column_names = _ref_bool(value, True)
        elif name == "First row in destination files shall contain column names":
            s.destination_first_row_contains_column_names = _ref_bool(value, True)
        elif name == "Source folder" and value:
            s.source_path = value
        elif name == "Source file" and value:
            s.source_file = value
        elif name == "Destination folder" and value:
            s.destination_path = value
        elif name == "Input Field delimiter" and value:
            s.source_field_delimiter = value
        elif name == "Output Field delimiter" and value:
            s.destination_field_delimiter = value
        elif name in ("Input string delimiter", "Output string delimiter") and value:
            s.quote_char = value
        elif name == "Destination encoding" and value:
            s.destination_encoding = _ref_encoding(value)
        elif name == "Source decimal separator":
            s.source_decimal_separator = _ref_decimal_mode(value)
        elif name == "Delete source files":
            s.delete_source_files = _ref_bool(value, False)
        elif name == "Include timestamp in filename":
            s.include_timestamp_in_filename = _ref_bool(value, False)
        elif name == "Ignore defective rows":
            s.ignore_defective_rows = _ref_bool(value, False)
    return s


def jobspec_from_xml(
    xml: str,
    source_folder: str | None = None,
    source_file: str | None = None,
    destination_folder: str | None = None,
) -> JobSpec:
    """One-way XML → :class:`JobSpec`. Auto-detects the element form
    (``SaveAsXml``) vs the parameter form (``Serialize()``, root element
    ``Parameters``). Path overrides let a migrated spec point at local
    data (the XML's Windows ``/Files/`` paths rarely exist verbatim on
    the cluster); mappings are framework-side in the reference and start
    empty here — add them programmatically or via JSON."""
    root_tag = ET.fromstring(xml).tag
    s = (
        parse_parameters_xml(xml)
        if root_tag == "Parameters"
        else parse_provider_xml(xml)
    )
    src_opts = CsvSourceOptions(
        delimiter=s.source_field_delimiter,
        quote=s.quote_char,
        first_row_contains_column_names=s.source_first_row_contains_column_names,
        decimal_separator=s.source_decimal_separator,
        ignore_defective_rows=s.ignore_defective_rows,
        delete_source_files_after_job=s.delete_source_files,
    )
    dst_opts = CsvSinkOptions(
        delimiter=s.destination_field_delimiter,
        quote=s.quote_char,
        first_row_contains_column_names=s.destination_first_row_contains_column_names,
        encoding=s.destination_encoding,
        include_timestamp_in_filename=s.include_timestamp_in_filename,
    )
    return JobSpec(
        source=CsvSource(
            folder=source_folder or (s.source_path or None),
            file=source_file or (s.source_file or None),
            options=src_opts,
        ),
        destination=CsvSink(
            folder=destination_folder or (s.destination_path or "."),
            options=dst_opts,
        ),
    )


def _esc_cdata(value: str) -> str:
    """CDATA-wrap, splitting any ']]>' terminator (cannot appear raw)."""
    return "<![CDATA[" + value.replace("]]>", "]]]]><![CDATA[>") + "]]>"


def jobspec_to_xml(job: JobSpec) -> str:
    """JobSpec → the reference's SaveAsXml element form — the export
    side of the migration bridge, emitting exactly the elements the
    ``CsvProvider(XmlNode)`` constructor reads (CSVProvider.cs:363-454)
    with the reference writer's shapes (CSVProvider.cs:317-351): CDATA
    delimiters/quote, ``True``/``False`` booleans, the UI decimal
    sentinels, and the encoding option labels. ``parse_provider_xml``
    of this output reproduces the settings (round-trip pinned by
    test)."""
    src, dst = job.source.options, job.destination.options
    decimal = {
        "system": NONE_DECIMAL_SEPARATOR,
        "auto": DETECT_AUTOMATICALLY_SEPARATOR,
    }.get(src.decimal_separator, src.decimal_separator)
    enc = {
        "windows-1252": "Windows-1252 (default legacy components of "
        "Microsoft Windows. English and most of Europe)",
        "windows-1251": "Windows-1251 (covering cyrillic, Eastern Europe)",
        "UTF-16": "Unicode (UTF16)",
    }.get(dst.encoding, "Unicode (UTF-8)")

    def b(v: bool) -> str:
        return "True" if v else "False"

    parts = [
        "<CsvProvider>",
        f"  <SourceFieldDelimiter>{_esc_cdata(src.delimiter)}</SourceFieldDelimiter>",
        f"  <DestinationFieldDelimiter>{_esc_cdata(dst.delimiter)}</DestinationFieldDelimiter>",
        f"  <QuoteChar>{_esc_cdata(src.quote)}</QuoteChar>",
        f"  <SourceFirstRowContainsColumnNames>{b(src.first_row_contains_column_names)}</SourceFirstRowContainsColumnNames>",
        f"  <DestinationFirstRowContainsColumnNames>{b(dst.first_row_contains_column_names)}</DestinationFirstRowContainsColumnNames>",
        f"  <SourcePath>{job.source.folder or ''}</SourcePath>",
        f"  <SourceFile>{job.source.file or ''}</SourceFile>",
        f"  <DestinationPath>{job.destination.folder}</DestinationPath>",
        f"  <DestinationEncoding>{enc}</DestinationEncoding>",
        f"  <SourceDecimalSeparator>{decimal}</SourceDecimalSeparator>",
        f"  <DeleteSourceFiles>{b(src.delete_source_files_after_job)}</DeleteSourceFiles>",
        f"  <IncludeTimestampInFileName>{b(dst.include_timestamp_in_filename)}</IncludeTimestampInFileName>",
        f"  <IgnoreDefectiveRows>{b(src.ignore_defective_rows)}</IgnoreDefectiveRows>",
        "</CsvProvider>",
    ]
    return "\n".join(parts)
