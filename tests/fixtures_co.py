"""Deterministic synthetic CO_healthy source tables (FIXTURES.md §A).

Hand-built rows chosen to exercise every semantic the reference
pipelines exhibit: duplicate rows (dedup), mojibake city names (accent
repair), out-of-window dates (inner date-join loss), missing company
links (left-join + fillna 0), users without preexistences (inner
disease-join loss), multi-valued medicine lists (explode grain), and
shared demographic tuples (attribute-dim recovery)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_co_healthy_spark.schemas import REFERENCE

D = dt.date


def _df(spark: SparkSession, name: str, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, REFERENCE[name])


def make_sources(spark: SparkSession) -> dict[str, DataFrame]:
    cotizante = [
        # cedula nombre nacimiento sexo tipo nivel afiliacion otra_eps ips
        #   direccion estado_civil estracto discapacidad salario
        ("C1", "Ana", D(1980, 1, 1), "F", "dependiente", "uni",
         D(2006, 2, 1), 1, "IPS1", "Calle 1", "soltero", 3, "ninguna", 2000.0),
        ("C2", "Beto", D(1975, 5, 5), "M", "independiente", "sec",
         D(2007, 3, 1), 0, "IPS2", "Calle 2", "casado", 2, "ninguna", 1500.0),
        ("C3", "Caro", D(1990, 7, 9), "F", "dependiente", "uni",
         D(2008, 4, 1), 1, "IPS3", "Calle 1", "soltero", 3, "ninguna", 2000.0),
        # C4 shares C1's demographic tuple → same demografica_id
        ("C4", "Dario", D(1985, 3, 3), "M", "dependiente", "pri",
         D(2009, 5, 1), 0, "IPS1", "Calle 1", "soltero", 3, "ninguna", 2000.0),
        # exact duplicate row → dropDuplicates in dim_cotizante
        ("C2", "Beto", D(1975, 5, 5), "M", "independiente", "sec",
         D(2007, 3, 1), 0, "IPS2", "Calle 2", "casado", 2, "ninguna", 1500.0),
    ]
    beneficiario = [
        ("B1", "Eli", D(2000, 1, 1), "F"),
        ("B2", "Fede", D(2001, 2, 2), "M"),
        ("B2", "Fede", D(2001, 2, 2), "M"),  # duplicate
    ]
    ips = [
        ("IPS1", "Clinica Uno", "Cra 1", "clinica", "Bogota"),
        ("IPS2", "Hospital Dos", "Cra 2", "hospital", "Medellin"),
        ("IPS3", "Centro Tres", "Cra 3", "centro", "Facatativ�"),
    ]
    medico = [
        ("M1", "Dr Uno", "general", "cardio", "IPS1", "Consultorio 1"),
        ("M2", "Dr Dos", "pediatria", None, "IPS2", "Consultorio 2"),
        ("M3", "Dr Tres", "general", None, "IPS3", "Consultorio 3"),
    ]
    preexistencias = [
        ("C1", "diabetes"),
        ("C2", "hipertension"),
        ("C3", "diabetes"),
    ]
    empresa = [("E1", "Empresa Uno"), ("E2", "Empresa Dos")]
    empresa_cotizante = [("C1", "E1"), ("C3", "E2")]
    formulas_medicas = [
        ("F1", "C1", "M1", D(2006, 6, 1), "MED1;MED2"),
        ("F2", "B1", "M2", D(2007, 7, 2), "MED3"),
        ("F3", "C2", "M1", D(2012, 1, 1), "MED1"),   # outside date window
        ("F4", "C3", "M3", D(2008, 8, 3), "MED9"),   # unknown medicine
    ]
    pagos = [
        ("C1", D(2006, 6, 15), 100.0),   # full links
        ("C2", D(2007, 7, 15), 200.0),   # no company → empresa_id 0
        ("C3", D(2008, 8, 15), 300.0),   # company E2
        ("C4", D(2009, 9, 15), 400.0),   # no preexistence → dropped
        ("C1", D(2012, 2, 2), 500.0),    # outside window → dropped
    ]
    retiros = [
        ("C1", D(2006, 6, 20), "EPS Sura"),      # IPS1 Bogota → repaired
        ("C3", D(2008, 8, 20), "EPS Sanitas"),   # IPS3 mojibake → repaired
        ("C2", D(2012, 3, 3), "EPS Salud"),      # outside window → dropped
    ]
    citas_generales = [
        ("CT1", "C1", "M1", D(2006, 6, 1), "08:15:00",
         D(2006, 6, 2), "09:30:00", "gripe"),
    ]
    urgencias = [
        ("UR1", "B1", "M2", D(2007, 7, 1), "22:45:00",
         D(2007, 7, 1), "23:00:00", "fractura"),
    ]
    hospitalizaciones = [
        ("HO1", 3, "C2", "M2", D(2008, 8, 1), "10:00:00",
         D(2008, 8, 2), "11:15:00", "neumonia"),
    ]
    remisiones = [
        ("RE1", "C3", "M3", "M1", "SP1", D(2009, 9, 1), "14:30:00",
         D(2009, 9, 3), "15:00:00"),
        # SP9 has no servicios_pos row → dropped by inner enrichment join
        ("RE2", "C1", "M1", "M2", "SP9", D(2009, 9, 5), "16:00:00",
         D(2009, 9, 6), "16:30:00"),
    ]
    servicios_pos = [
        ("SP1", "resonancia magnetica", 350.0),
        ("SP2", "radiografia", 80.0),
    ]
    medicamentos = [
        ("MED1", "Acetaminofen", "tableta", "500mg x 20", "Lab A - R1",
         10.5, "Genérico"),
        ("MED2", "Ibuprofeno", "capsula", "400mg x 10", "Lab B - R2",
         8.0, "Genérico"),
        ("MED3", "Amoxicilina", "suspension", "250ml", "Lab C - R3",
         15.0, "Comercial"),
        ("MED3", "Amoxicilina", "suspension", "250ml", "Lab C - R3",
         15.0, "Comercial"),  # duplicate
    ]
    regiones_co = [
        ("Bogotá D.C.", "Cundinamarca", "Andina"),
        ("Medellín", "Antioquia", "Andina"),
        ("Facatativá", "Cundinamarca", "Andina"),
        ("Quibdó", "Chocó", "Pacífica"),
    ]
    data = {
        "cotizante": cotizante,
        "beneficiario": beneficiario,
        "ips": ips,
        "medico": medico,
        "preexistencias": preexistencias,
        "empresa": empresa,
        "empresa_cotizante": empresa_cotizante,
        "formulas_medicas": formulas_medicas,
        "pagos": pagos,
        "retiros": retiros,
        "citas_generales": citas_generales,
        "urgencias": urgencias,
        "hospitalizaciones": hospitalizaciones,
        "remisiones": remisiones,
        "servicios_pos": servicios_pos,
        "medicamentos": medicamentos,
        "regiones_co": regiones_co,
    }
    return {name: _df(spark, name, rows) for name, rows in data.items()}
