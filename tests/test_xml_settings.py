"""XML job-settings importer (xml_settings.py): migration fidelity for
the reference's two XML shapes — the SaveAsXml element form
(CSVProvider.cs:317-351/363-454) and the Serialize() parameter form
(CSVProvider.cs:497-517) — including the reference reader's quirks."""

from __future__ import annotations

from dataintegration_csvprovider_spark.xml_settings import (
    jobspec_from_xml,
    parse_parameters_xml,
    parse_provider_xml,
)

ELEMENT_FORM = """
<CsvProvider>
  <SourceFieldDelimiter><![CDATA[|]]></SourceFieldDelimiter>
  <DestinationFieldDelimiter><![CDATA[\t]]></DestinationFieldDelimiter>
  <QuoteChar><![CDATA[']]></QuoteChar>
  <SourceFirstRowContainsColumnNames>True</SourceFirstRowContainsColumnNames>
  <DestinationFirstRowContainsColumnNames>False</DestinationFirstRowContainsColumnNames>
  <SourcePath>/Files/Integration/inbox</SourcePath>
  <SourceFile>orders.csv</SourceFile>
  <DestinationPath>/Files/Integration/outbox</DestinationPath>
  <DestinationEncoding>Windows-1252 (default legacy components)</DestinationEncoding>
  <SourceDecimalSeparator>Detect automatically</SourceDecimalSeparator>
  <DeleteSourceFiles>True</DeleteSourceFiles>
  <IncludeTimestampInFileName>True</IncludeTimestampInFileName>
  <IgnoreDefectiveRows>True</IgnoreDefectiveRows>
  <Schema>
    <Tables>
      <Table Name="orders">
        <Columns>
          <Column Name="id"/>
          <Column Name="total"/>
        </Columns>
      </Table>
    </Tables>
  </Schema>
</CsvProvider>
"""


def test_element_form_full_parse():
    s = parse_provider_xml(ELEMENT_FORM)
    assert s.source_field_delimiter == "|"
    assert s.destination_field_delimiter == "\t"
    assert s.quote_char == "'"
    assert s.source_path == "/Files/Integration/inbox"
    assert s.source_file == "orders.csv"
    assert s.destination_path == "/Files/Integration/outbox"
    assert s.source_first_row_contains_column_names is True
    assert s.destination_first_row_contains_column_names is False
    assert s.destination_encoding == "windows-1252"  # substring dispatch
    assert s.source_decimal_separator == "auto"  # UI sentinel mapped
    assert s.delete_source_files is True
    assert s.include_timestamp_in_filename is True
    assert s.ignore_defective_rows is True
    assert s.schema_tables == {"orders": ["id", "total"]}


def test_reference_boolean_quirk_exact_True_only():
    # node.FirstChild.Value == "True" (CSVProvider.cs:417) — lowercase
    # "true" is FALSY in the reference, so it must be falsy here
    xml = """<P>
      <SourceFirstRowContainsColumnNames>true</SourceFirstRowContainsColumnNames>
      <DeleteSourceFiles>TRUE</DeleteSourceFiles>
    </P>"""
    s = parse_provider_xml(xml)
    assert s.source_first_row_contains_column_names is False
    assert s.delete_source_files is False


def test_empty_elements_keep_defaults():
    # every reference case guards on HasChildNodes — empty elements are
    # no-ops, not resets
    xml = """<P>
      <SourceFieldDelimiter></SourceFieldDelimiter>
      <QuoteChar></QuoteChar>
      <SourcePath/>
    </P>"""
    s = parse_provider_xml(xml)
    assert s.source_field_delimiter == ";"  # CSVProvider.cs:34 default
    assert s.quote_char == '"'  # CSVProvider.cs:35 default
    assert s.source_path == ""


def test_decimal_separator_sentinels():
    for raw, want in [
        ("Use system culture", "system"),
        ("Detect automatically", "auto"),
        (".", "."),
        (",", ","),
    ]:
        xml = f"<P><SourceDecimalSeparator>{raw}</SourceDecimalSeparator></P>"
        assert parse_provider_xml(xml).source_decimal_separator == want


def test_encoding_substring_dispatch():
    # GetEncoding resolves by substring (CSVProvider.cs:603-616); unknown
    # falls back to UTF-8
    for raw, want in [
        ("anything 1252 here", "windows-1252"),
        ("cyrillic 1251", "windows-1251"),
        ("UTF16", "UTF-16"),
        ("Unicode (UTF-8)", "UTF-8"),
        ("garbage", "UTF-8"),
    ]:
        xml = f"<P><DestinationEncoding>{raw}</DestinationEncoding></P>"
        assert parse_provider_xml(xml).destination_encoding == want


def test_parameters_form_attribute_and_element_styles():
    attr_xml = """<Parameters>
      <Parameter name="Input Field delimiter" value=","/>
      <Parameter name="Source folder" value="/Files/in"/>
      <Parameter name="Ignore defective rows" value="True"/>
    </Parameters>"""
    s = parse_parameters_xml(attr_xml)
    assert s.source_field_delimiter == ","
    assert s.source_path == "/Files/in"
    assert s.ignore_defective_rows is True

    elem_xml = """<Parameters>
      <Parameter><Name>Output Field delimiter</Name><Value>;</Value></Parameter>
      <Parameter><Key>Destination folder</Key><Value>/Files/out</Value></Parameter>
      <Parameter><Name>Include timestamp in filename</Name><Value>True</Value></Parameter>
    </Parameters>"""
    s2 = parse_parameters_xml(elem_xml)
    assert s2.destination_field_delimiter == ";"
    assert s2.destination_path == "/Files/out"
    assert s2.include_timestamp_in_filename is True


def test_jobspec_from_xml_autodetects_form_and_maps_options():
    job = jobspec_from_xml(
        ELEMENT_FORM, source_folder="/tmp/in", destination_folder="/tmp/out"
    )
    # path overrides win over the XML's /Files/ paths
    assert job.source.folder == "/tmp/in"
    assert job.destination.folder == "/tmp/out"
    assert job.source.file == "orders.csv"  # file still carried over
    assert job.source.options.delimiter == "|"
    assert job.source.options.quote == "'"
    assert job.source.options.decimal_separator == "auto"
    assert job.source.options.ignore_defective_rows is True
    assert job.source.options.delete_source_files_after_job is True
    assert job.destination.options.delimiter == "\t"
    assert job.destination.options.encoding == "windows-1252"
    assert job.destination.options.include_timestamp_in_filename is True
    assert job.destination.options.first_row_contains_column_names is False

    params = """<Parameters>
      <Parameter name="Input Field delimiter" value="|"/>
    </Parameters>"""
    job2 = jobspec_from_xml(params, source_folder="/tmp/x", destination_folder="/tmp/y")
    assert job2.source.options.delimiter == "|"


def test_jobspec_xml_roundtrip():
    """export -> parse reproduces every setting the reference
    constructor reads, including quirky values (tab delimiter,
    single-quote char, cp1251, explicit ',' separator)."""
    from dataintegration_csvprovider_spark.jobs import JobSpec
    from dataintegration_csvprovider_spark.sinks.csv_sink import (
        CsvSink,
        CsvSinkOptions,
    )
    from dataintegration_csvprovider_spark.sources.csv_source import (
        CsvSource,
        CsvSourceOptions,
    )
    from dataintegration_csvprovider_spark.xml_settings import (
        jobspec_from_xml,
        jobspec_to_xml,
    )

    job = JobSpec(
        source=CsvSource(
            folder="/data/in",
            file="x.csv",
            options=CsvSourceOptions(
                delimiter="\t",
                quote="'",
                first_row_contains_column_names=False,
                decimal_separator=",",
                ignore_defective_rows=True,
                delete_source_files_after_job=True,
            ),
        ),
        destination=CsvSink(
            folder="/data/out",
            options=CsvSinkOptions(
                delimiter="|",
                quote="'",
                first_row_contains_column_names=True,
                encoding="windows-1251",
                include_timestamp_in_filename=True,
            ),
        ),
    )
    back = jobspec_from_xml(jobspec_to_xml(job))
    assert back.source.folder == "/data/in"
    assert back.source.file == "x.csv"
    assert back.destination.folder == "/data/out"
    s, d = back.source.options, back.destination.options
    assert s.delimiter == "\t" and d.delimiter == "|"
    assert s.quote == "'"
    assert s.first_row_contains_column_names is False
    assert d.first_row_contains_column_names is True
    assert s.decimal_separator == ","
    assert s.ignore_defective_rows is True
    assert s.delete_source_files_after_job is True
    assert d.encoding == "windows-1251"
    assert d.include_timestamp_in_filename is True

    # 'system'/'auto' sentinels survive the trip too
    job.source.options.decimal_separator = "auto"
    assert jobspec_from_xml(jobspec_to_xml(job)).source.options.decimal_separator == "auto"
    job.source.options.decimal_separator = "system"
    assert jobspec_from_xml(jobspec_to_xml(job)).source.options.decimal_separator == "system"


def test_cdata_terminator_escape():
    from dataintegration_csvprovider_spark.xml_settings import _esc_cdata
    import xml.etree.ElementTree as ET

    tricky = "a]]>b"
    xml = f"<X>{_esc_cdata(tricky)}</X>"
    assert ET.fromstring(xml).text == tricky
