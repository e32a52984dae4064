package graft.queries

import graft.QuerySpec

/** The full registered query surface — SURVEY.md §2 inventory plus the
  * §2.14 north-star extensions. Names are stable; the driver's DuckDB
  * oracle checks every spec that carries an oracle string.
  */
object AllQueries {
  val specs: Seq[QuerySpec] =
    RelationalQueries.specs ++ EventQueries.specs ++ TextQueries.specs ++
      ScaleQueries.specs ++ ExtraQueries.specs ++ WideQueries.specs ++
      R3Queries.specs ++ R4Queries.specs ++ R5Queries.specs ++ R6Queries.specs ++
      R7Queries.specs ++ R8Queries.specs ++ R9Queries.specs ++ R10Queries.specs ++
      R11Queries.specs ++ R12Queries.specs ++ R13Queries.specs ++ R14Queries.specs ++
      R15Queries.specs ++ R16Queries.specs ++ R17Queries.specs ++
      R18Queries.specs ++ R19Queries.specs ++ R20Queries.specs ++
      R21Queries.specs ++ R22Queries.specs ++ R23Queries.specs ++
      R24Queries.specs ++ R25Queries.specs ++ R26Queries.specs ++
      R27Queries.specs ++ R28Queries.specs ++ R29Queries.specs ++ R30Queries.specs ++
      R31Queries.specs ++ R32Queries.specs ++ R33Queries.specs ++ R34Queries.specs ++ R35Queries.specs ++
      R36Queries.specs ++ R37Queries.specs ++ R38Queries.specs ++ R39Queries.specs ++
      R40Queries.specs ++ R41Queries.specs ++ R42Queries.specs ++
      R43Queries.specs ++ R44Queries.specs ++ R45Queries.specs ++ R46Queries.specs ++ R47Queries.specs ++ R48Queries.specs ++
      R49Queries.specs ++ R50Queries.specs ++ R51Queries.specs ++ R52Queries.specs ++
      R53Queries.specs ++ R54Queries.specs ++ R55Queries.specs ++ R56Queries.specs ++
      R57Queries.specs ++ R58Queries.specs ++ R59Queries.specs ++ R60Queries.specs ++
      R61Queries.specs ++ R62Queries.specs ++ R63Queries.specs ++ R64Queries.specs ++
      R65Queries.specs ++ R66Queries.specs

  require(specs.map(_.name).distinct.size == specs.size, "duplicate query names")
}
