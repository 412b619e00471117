package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** JSON (de)serialization of the resource catalog — the analog of the
  * reference's dict-backed `BossResourceBasic` round-trip
  * (`spdb/project/basicresource.py:37-49`, `resource.py:304-311`): the
  * schema travels as JSON between services, so a resource must survive
  * `toJson(fromJson(s))` exactly.
  */
object ResourceJson {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Flat wire form (stable field names, enum-as-string). */
  private case class Wire(
      collection: String,
      collectionDescription: String,
      experiment: String,
      numHierarchyLevels: Int,
      hierarchyMethod: String,
      numTimeSamples: Int,
      timeStep: Long,
      timeStepUnit: String,
      coordFrame: String,
      xStart: Long, xStop: Long,
      yStart: Long, yStop: Long,
      zStart: Long, zStop: Long,
      xVoxelSize: Double, yVoxelSize: Double, zVoxelSize: Double,
      voxelUnit: String,
      channel: String,
      channelType: String,
      datatype: String,
      baseResolution: Int,
      sources: Seq[String],
      related: Seq[String],
      defaultTimeSample: Int,
      lookupKey: String)

  def toJson(r: Resource): String = {
    val w = Wire(
      r.collection.name, r.collection.description,
      r.experiment.name, r.experiment.numHierarchyLevels,
      r.experiment.hierarchyMethod match {
        case HierarchyMethod.Isotropic => "isotropic"
        case HierarchyMethod.Anisotropic => "anisotropic"
      },
      r.experiment.numTimeSamples, r.experiment.timeStep, r.experiment.timeStepUnit,
      r.coordFrame.name,
      r.coordFrame.xStart, r.coordFrame.xStop,
      r.coordFrame.yStart, r.coordFrame.yStop,
      r.coordFrame.zStart, r.coordFrame.zStop,
      r.coordFrame.xVoxelSize, r.coordFrame.yVoxelSize, r.coordFrame.zVoxelSize,
      r.coordFrame.voxelUnit,
      r.channel.name,
      r.channel.channelType match {
        case ChannelType.Image => "image"
        case ChannelType.Annotation => "annotation"
      },
      r.channel.datatype.name, r.channel.baseResolution,
      r.channel.sources, r.channel.related, r.channel.defaultTimeSample,
      r.lookupKey)
    mapper.writeValueAsString(w)
  }

  def fromJson(s: String): Resource = {
    val w = mapper.readValue(s, classOf[Wire])
    Resource(
      Collection(w.collection, w.collectionDescription),
      Experiment(w.experiment, w.numHierarchyLevels,
        HierarchyMethod.parse(w.hierarchyMethod),
        w.numTimeSamples, w.timeStep, w.timeStepUnit),
      CoordinateFrame(w.coordFrame,
        w.xStart, w.xStop, w.yStart, w.yStop, w.zStart, w.zStop,
        w.xVoxelSize, w.yVoxelSize, w.zVoxelSize, w.voxelUnit),
      Channel(w.channel,
        if (w.channelType == "image") ChannelType.Image else ChannelType.Annotation,
        VoxelType.parse(w.datatype), w.baseResolution,
        w.sources, w.related, w.defaultTimeSample),
      w.lookupKey)
  }
}
