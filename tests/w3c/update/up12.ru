PREFIX ex: <http://ex/>
INSERT DATA { GRAPH <http://ex/g3> { ex:new ex:flag "on" } }
