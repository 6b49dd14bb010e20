package graft.kv.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory}
import org.apache.spark.sql.types.DataType

/** Spark's group-based row-level operation framework (UPDATE / MERGE
  * rewrites planned as ReplaceData) feeds the replacement write rows
  * whose ordinal 0 is the internal `__row_operation` code
  * (RowDeltaUtils.OPERATION_COLUMN); the declared write schema does NOT
  * include it — connectors are expected to consume the code and write
  * the remaining fields. This factory adapts a plain file-writing
  * factory by shifting every accessor one ordinal right, exposing
  * exactly the declared row schema to the underlying parquet writer. */
final class OpStrippingWriterFactory(inner: DataWriterFactory)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      private val shifted = new ShiftedRow
      override def write(record: InternalRow): Unit = {
        shifted.row = record
        w.write(shifted)
      }
      override def commit() = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
      override def currentMetricsValues(): Array[CustomTaskMetric] =
        w.currentMetricsValues()
    }
  }
}

/** View of an InternalRow with the leading column hidden (every ordinal
  * shifted by one). Mutable holder so one instance serves a whole
  * partition — the parquet writer consumes each row before the next
  * `write` call. */
private[connector] final class ShiftedRow extends InternalRow {
  var row: InternalRow = _

  override def numFields: Int = row.numFields - 1
  override def setNullAt(i: Int): Unit = row.setNullAt(i + 1)
  override def update(i: Int, value: Any): Unit = row.update(i + 1, value)
  override def copy(): InternalRow = {
    val c = new ShiftedRow
    c.row = row.copy()
    c
  }
  override def isNullAt(i: Int): Boolean = row.isNullAt(i + 1)
  override def getBoolean(i: Int): Boolean = row.getBoolean(i + 1)
  override def getByte(i: Int): Byte = row.getByte(i + 1)
  override def getShort(i: Int): Short = row.getShort(i + 1)
  override def getInt(i: Int): Int = row.getInt(i + 1)
  override def getLong(i: Int): Long = row.getLong(i + 1)
  override def getFloat(i: Int): Float = row.getFloat(i + 1)
  override def getDouble(i: Int): Double = row.getDouble(i + 1)
  override def getDecimal(i: Int, precision: Int, scale: Int) =
    row.getDecimal(i + 1, precision, scale)
  override def getUTF8String(i: Int) = row.getUTF8String(i + 1)
  override def getBinary(i: Int): Array[Byte] = row.getBinary(i + 1)
  override def getGeography(i: Int) = row.getGeography(i + 1)
  override def getGeometry(i: Int) = row.getGeometry(i + 1)
  override def getInterval(i: Int) = row.getInterval(i + 1)
  override def getVariant(i: Int) = row.getVariant(i + 1)
  override def getStruct(i: Int, numFields: Int) = row.getStruct(i + 1, numFields)
  override def getArray(i: Int) = row.getArray(i + 1)
  override def getMap(i: Int) = row.getMap(i + 1)
  override def get(i: Int, dataType: DataType): AnyRef = row.get(i + 1, dataType)
}
