package graft.server

import graft.model.MutableGraph

/** Test bridge into the package-private graph registry, so specs in
  * package `graft` can attach a GrpcServer to a GraftServer's graphs the
  * way the combined main does. */
object TestRegistry {
  def of(s: GraftServer): java.util.concurrent.ConcurrentHashMap[String, MutableGraph] =
    s.graphRegistry

  def mappingsOf(s: GraftServer):
      java.util.concurrent.ConcurrentHashMap[String, graft.model.Gripper.GraphConfig] =
    s.mappingRegistry

  def pluginsOf(s: GraftServer): Plugins = s.plugins
}
